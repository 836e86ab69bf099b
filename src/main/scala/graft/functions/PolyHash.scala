package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash h = fold((h, c) -> (h·mult + c) mod P) over the
  * characters of a string, P = 1e9+7.
  *
  * Native Catalyst expression with codegen: the equivalent built-in
  * composition `aggregate(transform(split(s, ""), ascii), ...)` allocates a
  * single-char UTF8String per character and evaluates interpreted (HOFs
  * don't codegen) — measured ~50× slower on shingle workloads. Semantics
  * are identical for ASCII/BMP input (per-UTF-16-unit fold), matching
  * DuckDB's `list_reduce` + `ascii` oracle formula exactly.
  */
object PolyHash {
  val Prime: Long = 1000000007L

  def hash(s: String, mult: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * mult + s.charAt(i)) % Prime
      i += 1
    }
    h
  }

  def hashUtf8(s: UTF8String, mult: Long): Long =
    if (s == null) 0L else hash(s.toString, mult)

  def poly_hash(c: Column, mult: Long = 31L): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(PolyHashExpr(ColumnBridge.expression(c), mult))
  }
}

case class PolyHashExpr(child: Expression, mult: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_hash requires a string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hashUtf8(input.asInstanceOf[UTF8String], mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hashUtf8($c, ${mult}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
