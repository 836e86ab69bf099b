package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd vector arithmetic over array<double> columns.
  *
  * The built-in composition `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is
  * an interpreted higher-order function: HOFs don't participate in whole-
  * stage codegen and zip_with ALLOCATES an intermediate array per row —
  * for pairwise similarity joins that is millions of allocations on the
  * hot path. [[DotProductExpr]] folds primitive doubles straight out of
  * the two ArrayData buffers in the generated code. The fold is the SAME
  * sequence of IEEE adds/multiplies in the same order, so results are
  * bit-identical to the HOF form (and to the DuckDB list_reduce twin),
  * including the null semantics: null when either array is null, the
  * lengths differ (zip_with pads with null), or any element is null.
  */
object VectorOps {

  /** Sequential-fold dot product; boxed null on any null condition. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = acc + a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column API: codegen'd sequential-fold dot product. */
  def dot_product(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<double> inputs, got " +
          s"${left.dataType} and ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Double ${ev.value}_r = graft.functions.VectorOps.dot($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
