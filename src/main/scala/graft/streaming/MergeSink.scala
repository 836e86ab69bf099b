package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming MERGE-INTO sink: maintain a latest-row-per-key parquet
  * state table from an update stream via `foreachBatch` — the sink-side
  * complement of the stateful operators in [[StreamingScore]] (which
  * keep state INSIDE the query; this materializes it as a table other
  * jobs can read between batches).
  *
  * Correctness does not depend on micro-batch boundaries:
  * latest-per-key under a TOTAL (orderCols, then keys) order is
  * associative — fold(old, latest(batch)) == latest(whole stream) for
  * any batch split — so the final table equals the batch twin
  * (`j6_latest_per_key`'s shape) row for row.
  *
  * Scale shape: the state table is hash-bucketed on the key
  * (`kb = pmod(hash(keys), numBuckets)` directories). Each batch
  * rewrites ONLY the buckets its keys touch: read state filtered to the
  * touched bucket list (partition-pruned scan), merge against the
  * batch's per-key winners, and write back with DYNAMIC partition
  * overwrite — untouched buckets are never read or written. A 100 TB
  * state table with a 1 GB batch touches ~batch-sized buckets, not the
  * table. The merged frame is checkpointed before the overwrite so the
  * write never reads the directory it replaces (Spark's
  * self-overwrite guard); a production deployment would version
  * directories Delta/Iceberg-style instead, same plan otherwise.
  */
object MergeSink {

  /** One winner row per key: rank 1 under orderCols DESC. `orderCols`
    * MUST totally order rows within a key (end with a unique id) — a
    * tie under row_number is free to flip between replays, and a
    * re-delivered row must beat its twin deterministically. */
  def latestPerKey(df: DataFrame, keys: Seq[String],
                   orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  private def bucketCol(keys: Seq[String], numBuckets: Int): Column =
    pmod(hash(keys.map(col): _*), lit(numBuckets))

  /** Fold one batch into the state table at `path`. Exposed for tests;
    * [[upsertStream]] wires it into foreachBatch. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, keys: Seq[String],
                 orderCols: Seq[String], path: String,
                 numBuckets: Int = 64): Unit = {
    if (batch.isEmpty) return
    val withKb = batch
      .withColumn("kb", bucketCol(keys, numBuckets))
      .localCheckpoint()
    val touched = withKb.select("kb").distinct()
      .collect().map(_.getInt(0)).toSeq // ≤ numBuckets driver-side ints
    val hasState = new java.io.File(path).exists()
    val all =
      if (!hasState) withKb
      else {
        val cur = spark.read.parquet(path)
          .where(col("kb").isin(touched: _*)) // partition-pruned
          .select(withKb.columns.map(col): _*)
        cur.unionByName(withKb)
      }
    // ONE exchange per batch (r13; guide §2.4): the old shape paid three
    // — a per-key window over the batch, a second window over the merged
    // union, and a final repartition(kb) for the write layout. But
    // kb = f(keys), so hash-clustering by kb already co-locates every
    // row of a key; sorting each bucket by (keys asc, orderCols desc)
    // makes the winner of each key exactly the first row of its key run,
    // detected with a null-safe lag compare. The window's PARTITION BY kb
    // matches the repartition's hashpartitioning(kb), so Catalyst reuses
    // the single exchange, and the output is already clustered by kb for
    // the partitioned write (one file per touched bucket per batch, as
    // before). Same winner rows — orderCols totally order rows within a
    // key (contract above), so first-of-run == row_number()==1 under the
    // per-key DESC window. Merge parallelism is min(numBuckets,
    // shuffle.partitions): numBuckets is the operator's declared scale
    // knob (it already bounds the write fan-out and the pruning unit),
    // so a 100 TB state table raises numBuckets, not this code path.
    val keyStruct = struct(keys.map(col): _*)
    val w = Window.partitionBy(col("kb"))
      .orderBy(keys.map(col(_).asc) ++ orderCols.map(col(_).desc): _*)
    val merged = all
      .repartition(col("kb"))
      .withColumn("__prev", lag(keyStruct, 1).over(w))
      .where(!(col("__prev") <=> keyStruct))
      .drop("__prev")
    // materialize BEFORE the overwrite: the write must not scan the
    // directory it is replacing.
    merged.localCheckpoint()
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("kb")
      .parquet(path)
  }

  /** Start the streaming upsert: AvailableNow by default (drain-and-stop,
    * the driver-gate mode); pass a different trigger for continuous use. */
  def upsertStream(updates: DataFrame, keys: Seq[String],
                   orderCols: Seq[String], path: String, checkpoint: String,
                   numBuckets: Int = 64,
                   trigger: org.apache.spark.sql.streaming.Trigger =
                     org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, keys, orderCols, path,
          numBuckets)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
