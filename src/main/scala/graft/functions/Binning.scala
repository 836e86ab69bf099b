package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Quantile-cut binning with the reference engine's semantics
  * (reference: utilities/Quantiles.scala:97-99): the bin of a value is the
  * index of the FIRST cut with value <= cut, and **-1 when the value exceeds
  * every cut** (`indexWhere` miss). The -1 quirk is part of the observable
  * word vocabulary, so it is preserved.
  */
object Binning {

  def bin(value: Double, cuts: Array[Double]): Int =
    cuts.indexWhere(cut => value <= cut)

  /** Pure column-expression form (codegen'd, no UDF):
    * `array_position(transform(cuts, c -> value <= c), true) - 1`
    * array_position is 1-based and returns 0 on miss, so the -1 miss quirk
    * falls out of the arithmetic for free.
    */
  def binCol(value: Column, cuts: Seq[Double]): Column = {
    val cutsArr = array(cuts.map(lit): _*)
    (array_position(transform(cutsArr, c => value <= c), lit(true)) - 1).cast("int")
  }

  /** SQL fragment with identical semantics for DuckDB oracles:
    * DuckDB's list_position is also 1-based and NULL on miss, so
    * `coalesce(pos, 0) - 1` reproduces the -1 quirk. */
  def binSql(valueExpr: String, cuts: Seq[Double]): String = {
    val arr = cuts.map(c => s"CAST($c AS DOUBLE)").mkString("[", ", ", "]")
    s"(COALESCE(list_position([($valueExpr) <= c for c in $arr], true), 0) - 1)"
  }
}
