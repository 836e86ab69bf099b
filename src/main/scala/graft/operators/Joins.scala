package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.DataFrame

/** Join operators Spark lacks as primitives, composed from built-ins
  * (preference (a) of the custom-operator ladder — Catalyst plans the
  * pieces; no custom strategy needed for these semantics).
  */
object Joins {

  /** As-of join: for each left row, the single right row with the GREATEST
    * `rightTs` <= `leftTs` among rows matching the equi-keys (inner
    * semantics — unmatched left rows drop, like DuckDB/kdb ASOF JOIN).
    * `forward = true` flips the direction: the SMALLEST `rightTs` >=
    * `leftTs` (the "next event at or after" shape — both bounds stay
    * inclusive, and the tiebreak rule is unchanged).
    * When two right rows can share (keys, rightTs), pass `rightTiebreak`
    * (greatest wins) — without it the winner among exact-timestamp ties is
    * partitioning-dependent. `toleranceMicros` bounds how STALE a match
    * may be (pandas merge_asof's tolerance): a left row whose nearest
    * in-direction right row is further than the tolerance drops.
    *
    * Shape — merge, not join: both sides union into one stream tagged by
    * side, each key partition is sorted once by (ts, side, tiebreak), and
    * a running `last(right-payload, ignoreNulls)` carries the most recent
    * right row forward onto every left row. Per-key cost is
    * O((|L|+|R|) log) with ONE shuffle and no join at all — an equi-join
    * with the time predicate would materialize every earlier right row per
    * left row (O(|L|·|R|) on hot keys) before a window pruned to top-1.
    *
    * Output: key columns + all other left columns + the right payload
    * columns (right minus keys minus `rightTs`), all unqualified; name
    * collisions between the two sides are the caller's to rename away.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightTiebreak: Option[String] = None,
               forward: Boolean = false,
               toleranceMicros: Option[Long] = None): DataFrame = {
    val leftPayload = left.columns.filterNot(keys.contains).toSeq
    val rightPayload = right.columns
      .filterNot(c => keys.contains(c) || c == rightTs).toSeq
    val tbType = rightTiebreak.map(t => right.schema(t).dataType).getOrElse(LongType)
    // Payload struct carries the whole right row; a nominal field keeps the
    // struct non-empty when the right side is keys+ts only.
    val rpFields =
      if (rightPayload.isEmpty) Seq(StructField("__present", LongType))
      else rightPayload.map(right.schema(_))
    val rpType = StructType(rpFields.toArray)
    val rpStruct =
      if (rightPayload.isEmpty) struct(lit(1L).as("__present"))
      else struct(rightPayload.map(col): _*)

    // null-timestamp and null-KEY rows never match under inner-asof
    // semantics (a join predicate l.k === r.k or r.ts <= l.ts evaluates
    // null → no match; DuckDB agrees) — filter both out up front. The ts
    // filter keeps NULLS FIRST ordering from carrying a null-ts right row
    // forward as a bogus "earliest match"; the key filter matters because
    // Window.partitionBy GROUPS null keys together, which would otherwise
    // let null-key left rows silently match null-key right rows.
    val keysNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val rSide = right.where(col(rightTs).isNotNull && keysNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        rightTiebreak.map(col).getOrElse(lit(0L)).as("__tb"),
        rpStruct.as("__rp")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lSide = left.where(col(leftTs).isNotNull && keysNotNull).select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(tbType).as("__tb"),
        lit(null).cast(rpType).as("__rp")) ++
        leftPayload.map(col): _*)

    // side 0 sorts before side 1 at equal ts (both bounds inclusive);
    // ascending tiebreak makes the max-tiebreak right row the one carried.
    // forward mode just reverses the time order: descending ts means the
    // carried "last right row" is the SMALLEST rightTs at-or-after leftTs.
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val union = rSide.unionByName(lSide)
    toleranceMicros match {
      case None =>
        union
          .withColumn("__match", last(col("__rp"), ignoreNulls = true).over(w))
          .where(col("__side") === 1 && col("__match").isNotNull)
          .select(keys.map(col) ++ leftPayload.map(col) ++
            rightPayload.map(c => col(s"__match.$c").as(c)): _*)
      case Some(tol) =>
        // tolerance: the carried match must lie within `tol` of the left
        // row's instant. The carry keeps the NEAREST right row in the
        // match direction, so if that one is out of tolerance every
        // other candidate is further away — one filter, no re-search.
        // Units: micros for timestamp columns, the column's own units
        // for numeric ts columns.
        require(tol >= 0, s"toleranceMicros must be >= 0, got $tol")
        val tsv = left.schema(leftTs).dataType match {
          case org.apache.spark.sql.types.TimestampType |
               org.apache.spark.sql.types.TimestampNTZType =>
            unix_micros(col("__ts").cast("timestamp_ltz"))
          case _ => col("__ts").cast("long")
        }
        val diff =
          if (forward) col("__mts") - col("__tsv")
          else col("__tsv") - col("__mts")
        union
          .withColumn("__tsv", tsv)
          .withColumn("__rtsv", when(col("__side") === 0, col("__tsv")))
          .withColumn("__match", last(col("__rp"), ignoreNulls = true).over(w))
          .withColumn("__mts", last(col("__rtsv"), ignoreNulls = true).over(w))
          .where(col("__side") === 1 && col("__match").isNotNull &&
            diff <= tol)
          .select(keys.map(col) ++ leftPayload.map(col) ++
            rightPayload.map(c => col(s"__match.$c").as(c)): _*)
    }
  }

  /** Range (interval-containment) join as a bucketed EQUI join — the scale
    * path when the interval side is too large to broadcast (a broadcast
    * inequality join degenerates to a nested-loop scan per row; fine for a
    * handful of intervals, wrong at millions). Both sides map onto
    * fixed-width time buckets: facts to the single bucket holding `ts`,
    * intervals to every bucket they overlap (explode of a bounded
    * `sequence` — intervals spanning b buckets appear b times). The join
    * is then a plain shuffled equi join on the bucket plus the residual
    * containment predicate; each fact matches an interval in EXACTLY the
    * fact's own bucket, so no dedup is needed. `bucketWidthMicros` trades
    * interval duplication (long intervals, narrow buckets) against
    * residual-filter selectivity (short intervals, wide buckets) — set it
    * near the typical interval length.
    *
    * Output: all fact columns + all interval columns. Containment is
    * `start <= ts < end` (same semantics as the broadcast form). */
  def rangeJoinBucketed(facts: DataFrame, ts: String,
                        intervals: DataFrame, start: String, end: String,
                        bucketWidthMicros: Long): DataFrame = {
    val w = bucketWidthMicros
    // ltz cast unifies TIMESTAMP and TIMESTAMP_NTZ inputs; both sides use
    // the same session zone, so bucket boundaries stay mutually consistent
    def micros(c: String) = unix_micros(col(c).cast("timestamp_ltz"))
    val f = facts.withColumn("__bucket", floor(micros(ts) / w))
    // empty/inverted intervals (end <= start) can never contain a ts; drop
    // them BEFORE the explode — sequence() would otherwise run DESCENDING
    // over an unbounded bucket range for bad data
    val iv = intervals.where(col(end) > col(start))
      .withColumn("__bucket",
        explode(sequence(floor(micros(start) / w),
          // end is exclusive: an interval ending exactly on a bucket
          // boundary does not reach into that bucket
          floor((micros(end) - 1) / w))))
    f.join(iv, Seq("__bucket"))
      .where(col(start) <= col(ts) && col(ts) < col(end))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join (interval × interval, the temporal-join
    * workhorse: sessions × incidents, downtimes × deploys) as a bucketed
    * equi join. Naively this is an inequality join — a nested-loop cross
    * at scale. Here BOTH sides explode onto fixed-width buckets and join
    * on the bucket plus the half-open overlap residual
    * (`lStart < rEnd && rStart < lEnd`). An overlapping pair co-occupies
    * every bucket its intersection spans, so to emit each pair EXACTLY
    * once — with no distinct pass over the (huge) pair stream — a row is
    * kept only in the bucket containing `greatest(lStart, rStart)`, the
    * intersection's first instant, which lies in exactly one bucket.
    * `bucketWidthMicros` trades explode duplication against residual
    * selectivity — set it near the typical interval length. Inverted or
    * empty intervals (end <= start) are dropped before the explode on
    * both sides. Output: all left columns then all right columns. */
  def intervalOverlapJoin(left: DataFrame, lStart: String, lEnd: String,
                          right: DataFrame, rStart: String, rEnd: String,
                          bucketWidthMicros: Long): DataFrame = {
    val w = bucketWidthMicros
    def micros(c: String) = unix_micros(col(c).cast("timestamp_ltz"))
    def burst(df: DataFrame, s: String, e: String) =
      df.where(col(e) > col(s))
        .withColumn("__bucket",
          explode(sequence(floor(micros(s) / w), floor((micros(e) - 1) / w))))
    val l = burst(left, lStart, lEnd)
    val r = burst(right, rStart, rEnd)
    l.join(r, Seq("__bucket"))
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        floor(greatest(micros(lStart), micros(rStart)) / w) === col("__bucket"))
      .drop("__bucket")
  }
}
