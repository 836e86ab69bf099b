package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy of the character distribution of a string.
  *
  * Semantics match the reference engine's `Entropy.stringEntropy`
  * (reference: utilities/Entropy.scala:16-23): H = Σ_c -(n_c/n)·log2(n_c/n),
  * with log base 2 computed as log10(p)/log10(2) and H("") == 0.0.
  */
object Entropy {

  def stringEntropy(v: String): Double = {
    if (v == null || v.isEmpty) return 0.0
    val counts = new java.util.HashMap[Char, Int]()
    var i = 0
    while (i < v.length) {
      counts.merge(v.charAt(i), 1, (a, b) => a + b)
      i += 1
    }
    val n = v.length.toDouble
    var h = 0.0
    val it = counts.values().iterator()
    val log2 = math.log10(2.0)
    while (it.hasNext) {
      val p = it.next() / n
      h += -p * math.log10(p) / log2
    }
    h
  }

  /** Codegen entry point: keeps the expression inside whole-stage codegen by
    * emitting a static call instead of a Scala-closure UDF. */
  def entropyOfUtf8(s: UTF8String): Double =
    if (s == null) 0.0 else stringEntropy(s.toString)

  /** Column API: `string_entropy(col)` as a native Catalyst expression. */
  def string_entropy(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(StringEntropyExpr(ColumnBridge.expression(c)))
  }
}

/** Native Catalyst expression for string entropy with codegen support —
  * stays inside WholeStageCodegen spans, unlike a Scala UDF. */
case class StringEntropyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"string_entropy requires a string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Entropy.entropyOfUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Entropy.entropyOfUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
