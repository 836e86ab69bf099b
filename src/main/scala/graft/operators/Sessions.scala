package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Batch sessionization — the gaps-and-islands assignment: per key,
  * events sort by (event time, id tiebreak) and a new session starts
  * wherever the gap from the previous event exceeds `gapSeconds`. The
  * session id is the per-key running count of session starts, so ids are
  * 1..n_sessions per key, deterministic and engine-independent.
  *
  * This is the batch twin of Structured Streaming's `session_window`
  * aggregation ([[graft.streaming.StreamingScore.sessionize]]): same
  * session boundaries, but every event keeps its session assignment (the
  * streaming form can only emit closed-session aggregates). Shape: one
  * shuffle (the per-key window); keys bound the partitions, so scale-out
  * is by key cardinality — never a global sort.
  */
object Sessions {

  /** Adds `session_seq` (1-based per key) to the input rows. The gap rule
    * is `>`: a new session starts only when the gap from the previous
    * event STRICTLY exceeds `gapSeconds`. This is session_window's
    * empirical boundary behavior — an event exactly `gapSeconds` after
    * the previous one lands on the window's end and Spark MERGES the
    * adjacent windows (StreamingSpec's parity test pins this with an
    * exactly-gap-apart fixture through both implementations; an earlier
    * `>=` reading of the half-open [start, start+gap) window was wrong
    * and diverged from streaming at the boundary). */
  def assign(events: DataFrame, key: Column, ts: Column, tiebreak: Column,
             gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col("__us"), col("__tb"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      // cast like Joins.asOfJoin: unix_micros rejects TIMESTAMP_NTZ (what
      // a TIMESTAMP_NS parquet surfaces as), and under the UTC session the
      // ltz cast is instant-identical. Caught by the 100x-replica verify.
      .withColumn("__us", unix_micros(ts.cast("timestamp_ltz")))
      .withColumn("__tb", tiebreak)
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__us") - col("__prev") > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(cum))
      .drop("__us", "__tb", "__prev", "__new")
  }

  /** Per-session aggregate: (key, session_seq, n_events, first_us,
    * last_us) — the closed-session summary shape. */
  def sessions(events: DataFrame, key: Column, ts: Column, tiebreak: Column,
               gapSeconds: Long): DataFrame =
    assign(events, key, ts, tiebreak, gapSeconds)
      .groupBy(key.as("key"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(ts.cast("timestamp_ltz"))).as("first_us"),
        max(unix_micros(ts.cast("timestamp_ltz"))).as("last_us"))

  /** Ordered funnel matching (the MATCH_RECOGNIZE-lite every analytics
    * stack ships): per key, the earliest event satisfying step 0, then
    * the earliest step-1 event STRICTLY after it, and so on — the greedy
    * leftmost match, which is the standard funnel semantics and the only
    * deterministic one (strict `>` also stops one event from satisfying
    * two steps at the same instant). Returns one row per key that
    * reached step 0: `depth` (1..n steps completed) and `t_<name>` epoch
    * micros per step, null where the funnel stalled.
    *
    * Shape: one filtered map-side projection evaluates every step
    * predicate in a single pass over the events; each step is then a
    * min-aggregation shuffled on the key joined against the previous
    * frontier — n aggregations and n−1 equi joins ALL keyed the same, so
    * AQE reuses the exchange and nothing is ever collected or sorted
    * globally. Greedy-leftmost is provably optimal for reach (if any
    * assignment completes k steps, the greedy one does), so no
    * backtracking pass exists to pay for. */
  def funnel(events: DataFrame, key: Column, ts: Column,
             steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.map(_._1).distinct.size == steps.size,
      s"duplicate step names in ${steps.map(_._1).mkString(",")}")
    val ev = events.select(
      (key.as("key") +: unix_micros(ts.cast("timestamp")).as("us") +:
        steps.zipWithIndex.map { case ((_, p), i) => p.as(s"__s$i") }): _*)
    val stage0 = ev.where(col("__s0")).groupBy("key")
      .agg(min("us").as("t0"))
    val stages = steps.indices.drop(1).scanLeft(stage0) { (prev, i) =>
      ev.where(col(s"__s$i"))
        .join(prev.select(col("key"), col(s"t${i - 1}")), "key")
        .where(col("us") > col(s"t${i - 1}"))
        .groupBy("key").agg(min("us").as(s"t$i"))
    }
    val joined = stages.tail.foldLeft(stage0) { (acc, st) =>
      acc.join(st.select(col("key"), st.columns.filter(_ != "key").map(col).head),
        Seq("key"), "left")
    }
    val depth = steps.indices.map(i =>
      when(col(s"t$i").isNotNull, 1).otherwise(0)).reduce(_ + _)
    joined.select(
      (col("key") +: depth.cast("int").as("depth") +:
        steps.zipWithIndex.map { case ((n, _), i) =>
          col(s"t$i").as(s"t_$n") }): _*)
  }
}
