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
}
