package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the CDC/audit primitive for pipeline
  * re-runs: given two versions of a table and a key, classify every key
  * as `added` (new only), `removed` (old only), or `changed` (present in
  * both with at least one differing compare column), with the list of
  * changed columns. Rows equal on every compare column are dropped by
  * default — at 100 TB the interesting output is the (tiny) delta, not a
  * copy of the table.
  *
  * Plan shape: ONE full-outer shuffle join on the key; presence flags
  * and null-safe column comparisons (`<=>`) are map-side projections on
  * the joined row. Nothing is collected; the delta is a DataFrame to
  * write or aggregate downstream. Comparison is null-safe per column, so
  * a null→value transition counts as a change, and null==null does not.
  */
object Diff {

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compare: Seq[String],
                   includeUnchanged: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(compare.nonEmpty, "snapshotDiff needs at least one compare column")
    def side(df: DataFrame, p: String) = df.select(
      (keys.map(k => col(k).as(s"$p$k")) ++
        compare.map(c => col(c).as(s"$p$c")) :+
        lit(1).as(s"${p}present")): _*)
    val o = side(oldDf, "o_")
    val n = side(newDf, "n_")
    val on = keys.map(k => o(s"o_$k") <=> n(s"n_$k")).reduce(_ && _)
    val joined = o.join(n, on, "full_outer")
    val changedCols = compare.map(c =>
      when(!(col(s"o_$c") <=> col(s"n_$c")), lit(c)))
    val status = when(col("o_present").isNull, lit("added"))
      .when(col("n_present").isNull, lit("removed"))
      .when(changedCols.map(_.isNotNull).reduce(_ || _), lit("changed"))
      .otherwise(lit("unchanged"))
    val out = joined
      .withColumn("status", status)
      .withColumn("changed_cols",
        when(col("status") === "changed",
          concat_ws(",", changedCols: _*)).otherwise(lit("")))
      .select(keys.map(k =>
        coalesce(col(s"o_$k"), col(s"n_$k")).as(k)) ++
        Seq(col("status"), col("changed_cols")): _*)
    if (includeUnchanged) out else out.where(col("status") =!= "unchanged")
  }
}
