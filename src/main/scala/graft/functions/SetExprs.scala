package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd set-intersection COUNT over two SORTED string arrays.
  *
  * The built-in `size(array_intersect(a, b))` is an interpreted expression
  * that builds a SQLOpenHashSet of the left array PER ROW — measured as
  * the d12 verify stage's hot path (r12 probe: SQLOpenHashSet init/add/
  * contains + per-element murmur hashing dominated the 3.7 M-candidate
  * verify at sf0.1). For inputs that are (a) element-distinct and
  * (b) sorted ascending, the intersection count is a single allocation-
  * free merge walk over the two ArrayData buffers, whole-stage-codegen
  * friendly — same integer count, so downstream decisions (the per-mille
  * Jaccard threshold and quotient) are bit-identical.
  *
  * CONTRACT: both arrays must be sorted ascending in UTF8String binary
  * order (Spark's `sort_array` order) with no duplicate elements — the
  * shape `sort_array(collect_list(<distinct tokens>))` produces. Nulls:
  * result is null when either array is null; null ELEMENTS are not
  * expected under the contract (sort_array puts them first; a null
  * element never equals anything, matching array_intersect's
  * null-excluding count when the other side holds no null).
  */
object SetOps {

  /** Merge-walk intersection count; boxed null when either side is null. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): java.lang.Long = {
    if (a == null || b == null) return null
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i)) { i += 1 }
      else if (b.isNullAt(j)) { j += 1 }
      else {
        val x = a.getUTF8String(i)
        val y = b.getUTF8String(j)
        val cmp = x.compareTo(y)
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    java.lang.Long.valueOf(c)
  }

  /** Column API: codegen'd sorted-merge intersection count. */
  def sorted_intersect_count(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SortedIntersectCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<string> inputs, got " +
          s"${left.dataType} and ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOps.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Long ${ev.value}_r =
         |  graft.functions.SetOps.sortedIntersectCount($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
