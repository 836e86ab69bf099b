package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Engine-stable rounding: `floor(x·10ˢ + 0.5) / 10ˢ`.
  *
  * Built-in `round()` semantics differ across engines on half-boundary
  * values — Spark rounds the shortest decimal representation HALF_UP,
  * DuckDB rounds the binary value — so the same double can round to two
  * different results (observed ~1/5000 rows on quality scores). This
  * formulation is pure IEEE multiply/add/floor/divide: identical inputs
  * give identical outputs in every engine. The DuckDB twin is
  * `floor((x) * 10^s + 0.5) / 10^s.0` (see the oracle builders).
  */
object Rounding {
  def stable(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale) // exact binary for the scales used (2, 6)
    floor(c * f + 0.5) / f
  }
  def r2(c: Column): Column = stable(c, 2)
  def r6(c: Column): Column = stable(c, 6)

  /** SQL twin for the DuckDB oracles. */
  def sql(expr: String, scale: Int): String = {
    val f = BigDecimal(math.pow(10, scale)).toBigInt
    s"floor(($expr) * $f + 0.5) / $f.0"
  }
}
