package graft

import graft.functions.{PolyHashExpr, StringEntropyExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the library's native
  * expressions as SQL functions, so `spark.sql("SELECT string_entropy(s),
  * poly_hash(s) ...")` works anywhere the extension is installed.
  *
  * Install via `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("string_entropy"),
      new ExpressionInfo(classOf[StringEntropyExpr].getName, "string_entropy"),
      (children: Seq[Expression]) => StringEntropyExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHashExpr].getName, "poly_hash"),
      (children: Seq[Expression]) => PolyHashExpr(children.head, 31L)))
  }
}
