package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization + canonical text cleanup — the first pass of
  * every web-scale text pipeline (the same page arrives NFC from one
  * crawler and NFD from another; exact/fuzzy dedup, shingle hashes, and
  * tokenizers all diverge on byte-different canonical equivalents unless
  * normalization runs first).
  *
  * Spark ships no normalization function, so `nfc` is a native Catalyst
  * expression over `java.text.Normalizer` (Unicode Normalization Form C —
  * the same standard algorithm DuckDB's `nfc_normalize` implements via
  * utf8proc, so the oracle reproduces it exactly). Already-NFC text — the
  * overwhelming majority at corpus scale — is a single fast
  * `isNormalized` scan with no allocation.
  */
object Normalize {

  def nfcString(s: UTF8String): UTF8String =
    if (s == null) null
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }

  /** Unicode NFC normalization of a string column. */
  def nfc(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(c)))
  }

  /** Full canonical cleanup: NFC, strip non-whitespace C0/DEL control
    * chars, collapse whitespace runs to single spaces, trim. Composes the
    * native [[nfc]] with codegen'd built-ins — map-only, zero shuffle.
    * (\\t \\n \\x0B \\x0C \\r survive the control strip because the
    * whitespace collapse owns them; both regexes mean the same character
    * sets in Java and RE2, so the DuckDB twin is literal.) */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(nfc(text),
      "[\\x00-\\x08\\x0E-\\x1F\\x7F]", ""), "\\s+", " "))
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc requires a string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Normalize.nfcString(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Normalize.nfcString($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
