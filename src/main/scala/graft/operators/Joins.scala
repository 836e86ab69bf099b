package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as primitives, composed from built-ins
  * (preference (a) of the custom-operator ladder — Catalyst plans the
  * pieces; no custom strategy needed for these semantics).
  */
object Joins {

  /** As-of join: for each left row, the single right row with the GREATEST
    * `rightTs` <= `leftTs` among rows matching the equi-keys (inner
    * semantics — unmatched left rows drop, like DuckDB/kdb ASOF JOIN).
    *
    * `leftId` must uniquely identify left rows (the dedup window keys on
    * it). When two right rows can share (keys, rightTs), pass
    * `rightTiebreak` (picked descending) — without it the winner among
    * exact-timestamp ties is partitioning-dependent.
    *
    * Shape: one equi-join shuffle on the keys with the time predicate
    * pushed into the join, then a per-left-row top-1 window — no cross
    * product, AQE-skew-splittable.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, leftId: String,
               rightTiebreak: Option[String] = None): DataFrame = {
    val l = left.as("l")
    val r = right.as("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val joined = l.join(r, keyCond && col(s"r.$rightTs") <= col(s"l.$leftTs"))
    val ordering = col(s"r.$rightTs").desc +:
      rightTiebreak.map(t => col(s"r.$t").desc).toSeq
    val w = Window.partitionBy(col(s"l.$leftId")).orderBy(ordering: _*)
    joined.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
