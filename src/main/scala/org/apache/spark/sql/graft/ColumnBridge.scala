/** Bridge into Spark's private[sql] Column <-> Expression conversion, so the
  * library can expose native Catalyst expressions (codegen'd, WSCG-friendly)
  * through the public Column API. Standard technique for Spark extensions
  * that ship custom expressions without a FunctionRegistry round-trip. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
