package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd token-array reductions.
  *
  * The built-in forms — `size(filter(toks, _.isin(...)))` and
  * `aggregate(transform(toks, length), 0.0, _+_)` — are interpreted
  * higher-order functions that allocate an intermediate array per row;
  * language-ID evaluates the marker count once per language per row, so
  * the allocation/interpretation cost is multiplied. These expressions
  * loop over the ArrayData buffer directly with no allocation and the
  * same null semantics, so results are identical.
  */
object TokenExprs {

  /** Count of tokens present in the marker vocabulary (null array → null;
    * null elements don't count — `isin` is null-unknown and `filter` keeps
    * only true). */
  def marker_count(toks: Column, markers: Seq[String]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MarkerCountExpr(ColumnBridge.expression(toks), markers))
  }

  /** Sum of token character lengths as a double (sequential fold — the
    * exact ops of the aggregate/transform form; null array OR any null
    * element → null, matching `length(null)` poisoning the fold). */
  def token_length_sum(toks: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(TokenLengthSumExpr(ColumnBridge.expression(toks)))
  }
}

case class MarkerCountExpr(child: Expression, markers: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val markerSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](markers.size * 2)
    markers.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"marker_count requires array<string>, got $t")
    }

  def count(a: ArrayData): Int = {
    var n = 0
    var i = 0
    val len = a.numElements()
    while (i < len) {
      if (!a.isNullAt(i) && markerSet.contains(a.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerCountExpr", this,
      classOf[MarkerCountExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class TokenLengthSumExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_length_sum requires array<string>, got $t")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    TokenLengthSumExpr.sum(a) // boxed null on null element
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""java.lang.Double ${ev.value}_r = graft.functions.TokenLengthSumExpr.sum($c);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenLengthSumExpr {
  /** Sequential double fold of `length(token)`; boxed null on any null
    * element (length(null) poisons the aggregate in the HOF form). */
  def sum(a: ArrayData): java.lang.Double = {
    var acc = 0.0
    var i = 0
    val len = a.numElements()
    while (i < len) {
      if (a.isNullAt(i)) return null
      acc = acc + a.getUTF8String(i).numChars().toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
