package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle hashes of a text column, as one native
  * codegen expression.
  *
  * Semantically identical to the composed form
  * `array_distinct(transform(shingles(tokens(text), n), polyHash))`
  * — whitespace tokens, shingles joined with a single space, polynomial
  * rolling hash mod 1e9+7 — but computed in a single pass over the string
  * with no token/shingle/array materialization. The composed HOF chain
  * evaluates interpreted at ~1ms/doc; this runs the whole corpus pass in
  * the scan stage. Set semantics only (element order is unspecified).
  */
object ShingleHash {
  def shingle_hashes(text: Column, n: Int, mult: Long = 31L): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ShingleHashExpr(ColumnBridge.expression(text), n, mult))
  }

  /** Positional (non-distinct) variant: one hash per shingle POSITION, in
    * document order — for span-level operators (duplicated-substring
    * profiling) where the i-th element is the span starting at token i. */
  def shingle_hashes_all(text: Column, n: Int, mult: Long = 31L): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      ShingleHashExpr(ColumnBridge.expression(text), n, mult, distinct = false))
  }

  /** Single pass: token boundaries found inline; each shingle's hash is
    * recomputed over its n tokens (bounded rescan, no big-int tricks —
    * exact parity with the char-fold the oracle replicates). */
  def hashes(s: UTF8String, n: Int, mult: Long): ArrayData =
    hashes(s, n, mult, distinct = true)

  def hashes(s: UTF8String, n: Int, mult: Long, distinct: Boolean): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Long])
    val str = s.toString
    // token spans (start, end) over runs of non-whitespace
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    val len = str.length
    while (i < len) {
      while (i < len && Character.isWhitespace(str.charAt(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !Character.isWhitespace(str.charAt(i))) i += 1
        ends.add(i)
      }
    }
    val nTok = starts.size()
    if (nTok < n) return new GenericArrayData(Array.empty[Long])
    val seen: java.util.Collection[java.lang.Long] =
      if (distinct) new java.util.LinkedHashSet[java.lang.Long]()
      else new java.util.ArrayList[java.lang.Long](nTok - n + 1)
    val prime = PolyHash.Prime
    var t = 0
    while (t <= nTok - n) {
      var h = 0L
      var k = 0
      while (k < n) {
        if (k > 0) h = (h * mult + ' ') % prime
        var p = starts.get(t + k)
        val e = ends.get(t + k)
        while (p < e) {
          h = (h * mult + str.charAt(p)) % prime
          p += 1
        }
        k += 1
      }
      seen.add(h)
      t += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

case class ShingleHashExpr(child: Expression, n: Int, mult: Long,
                           distinct: Boolean = true)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires a string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.hashes(input.asInstanceOf[UTF8String], n, mult, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHash.hashes($c, $n, ${mult}L, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
