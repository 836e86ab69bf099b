package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE-stats layer every planner and data-quality
  * monitor needs: one row per profiled column with row/null/distinct
  * counts, bounds, and a magnitude sum.
  *
  * Plan shape: the columns MELT to narrow (col_name, value) rows
  * ([[org.apache.spark.sql.Dataset.unpivot]], zero-copy projections — no
  * UDF, no per-column scan), then ONE hash aggregation over col_name
  * computes every statistic for every column in a single shuffle of
  * narrow rows. Profiling c columns of an n-row table is one pass over
  * n·c skinny rows, map-side combined — never c separate scans.
  *
  * Numeric statistics are exact micro-units (floor(v·1e6 + 0.5) as long)
  * so two engines agree bit-for-bit. `n_distinct` here is the EXACT
  * distinct count (one expand per aggregate, the oracle-checkable form);
  * at 100 TB swap in the mergeable HLL sketch ([[Sketches.hllDistinct]])
  * — same melt, same single pass, fixed 2^p state per column.
  */
object Profile {

  /** Numeric-column profile: (col_name, n_rows, n_nulls, n_distinct,
    * min_micro, max_micro, sum_micro). min/max/sum are null for an
    * all-null column (and sum_micro is a BIGINT — at petabyte scale give
    * it decimal(38,0) headroom, the aggregation is otherwise unchanged). */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val melted = df.unpivot(
      Array.empty[Column],
      cols.map(c => col(c).cast("double").as(c)).toArray,
      "col_name", "v")
    val micro = floor(col("v") * 1000000 + lit(0.5)).cast("long")
    melted.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
      countDistinct(col("v")).as("n_distinct"),
      min(micro).as("min_micro"),
      max(micro).as("max_micro"),
      sum(micro).as("sum_micro"))
  }

  /** String-column profile: lexicographic bounds and total length stand
    * in for the numeric magnitude columns; same melt + one-pass shape. */
  def stringProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val melted = df.unpivot(
      Array.empty[Column],
      cols.map(c => col(c).cast("string").as(c)).toArray,
      "col_name", "v")
    melted.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
      countDistinct(col("v")).as("n_distinct"),
      min(col("v")).as("min_str"),
      max(col("v")).as("max_str"),
      sum(length(col("v"))).as("sum_len"))
  }
}
