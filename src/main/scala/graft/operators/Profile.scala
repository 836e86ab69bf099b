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

  /** Population-stability-index drift between a reference slice and the
    * rest of the data — the train/serve distribution-shift monitor: B
    * equi-width bins derived from the REFERENCE bounds, per-bin
    * frequencies p (ref) and q (current), PSI term (p−q)·ln(p/q) per
    * bin (sum the column for the index; > 0.2 is the classic alarm).
    * Zero bins are smoothed to half a count (max(n, 0.5)/N), the
    * standard finite-sample correction, so the term is always defined.
    *
    * Plan shape: two bounded one-row aggregates (bounds, totals — the
    * model-sized driver scalars this repo allows), then ONE pass binning
    * + grouped count over the data; output is B rows. The PSI term is
    * micro-rounded (the f4-entropy convention) so engines replaying the
    * same doubles agree. */
  def psiDrift(df: DataFrame, value: Column, isRef: Column,
               bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 100000, s"bins in [2, 100000], got $bins")
    val d = df.where(value.isNotNull)
    val br = d.where(isRef).agg(min(value.cast("double")),
      max(value.cast("double"))).head()
    require(!br.isNullAt(0) && br.getDouble(1) > br.getDouble(0),
      "psiDrift: reference slice is empty or constant — no bins to derive")
    val (lo, hi) = (br.getDouble(0), br.getDouble(1))
    val w = (hi - lo) / bins
    val tr = d.agg(sum(when(isRef, 1L).otherwise(0L)),
      sum(when(!isRef, 1L).otherwise(0L))).head()
    val (nr, nc) = (tr.getLong(0).toDouble, tr.getLong(1).toDouble)
    require(nc > 0, "psiDrift: current slice is empty")
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((value.cast("double") - lit(lo)) / lit(w)).cast("int")))
    val p = greatest(col("n_ref").cast("double"), lit(0.5)) / lit(nr)
    val q = greatest(col("n_cur").cast("double"), lit(0.5)) / lit(nc)
    d.select(bin.as("bin"), isRef.as("is_ref"))
      .groupBy("bin")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
      .withColumn("psi_term",
        floor((p - q) * log(p / q) * 1000000 + lit(0.5)) / 1000000.0)
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
