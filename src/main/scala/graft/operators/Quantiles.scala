package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed exact quantiles via the empirical CDF.
  *
  * Semantics match the reference engine (reference:
  * utilities/Quantiles.scala:21-94): the quantile at threshold t is the
  * MINIMUM data value x with ECDF(x) >= t, and an empty input yields
  * +Infinity for every threshold.
  *
  * Scale shape — range-bucketed two-pass prefix sum, no global window:
  *   1. `groupBy(value).count()` — map-side partial aggregation; one row
  *      per DISTINCT value from here on.
  *   2. a cheap bounds pass (`percentile_approx` over the distinct values,
  *      collected: <= `buckets` doubles) fixes range-bucket boundaries as
  *      plan literals, so bucket assignment is deterministic under
  *      recomputation — no cache required for correctness.
  *   3. running sums are windowed PER BUCKET (parallel, bounded frames)
  *      and shifted by per-bucket offsets computed in-plan from the tiny
  *      (<= buckets rows) bucket-total frame, broadcast back.
  * Every value lands in exactly one bucket and buckets are range-ordered,
  * so local-cumsum + offset-of-lower-buckets is the exact global ECDF.
  * The distinct-value aggregate feeds several consumers; it is
  * materialized ONCE (lazy localCheckpoint in [[ecdf]], scoped cache in
  * [[computeCutSets]]) — AQE does not reuse the exchange across them.
  * For 100 TB continuous columns prefer [[approxQuantiles]] (single pass,
  * mergeable sketch) — the exact path is for reference-semantics parity.
  */
object Quantiles {

  val Deciles: Array[Double] = Array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0)
  val Quintiles: Array[Double] = Array(0.2, 0.4, 0.6, 0.8, 1.0)

  /** Default range-bucket count for the exact-ECDF window stage. */
  val DefaultBuckets = 32

  /** Range-bucket id from fixed boundary literals: bucket i holds values in
    * (bounds(i-1), bounds(i)]; the last bucket is open above. Equal values
    * always share a bucket, and buckets are ordered by value. */
  private def bucketCol(v: Column, bounds: Array[Double]): Column =
    if (bounds.isEmpty) lit(0)
    else {
      val first: Column = when(v <= bounds(0), lit(0))
      bounds.indices.drop(1).foldLeft(first) { (acc, i) =>
        acc.when(v <= bounds(i), lit(i))
      }.otherwise(lit(bounds.length))
    }

  /** Per-bucket exclusive prefix offsets + grand total, computed in-plan
    * from the tiny per-bucket totals frame (cross join over <= buckets²
    * rows, broadcast to the window stage). Input must have (groupCols...,
    * bucket, t); output has (groupCols..., bucket, offset, total). */
  private def bucketOffsets(btot: DataFrame, groupCols: Seq[String]): DataFrame = {
    val other = btot.select(
      (groupCols.map(c => col(c).as(s"__g_$c")) ++
        Seq(col("bucket").as("__bb"), col("t").as("__bt"))): _*)
    val joinCond = groupCols.map(c => col(c) === col(s"__g_$c"))
      .foldLeft(lit(true))(_ && _)
    btot.join(other, joinCond)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(sum(when(col("__bb") < col("bucket"), col("__bt")).otherwise(0L)).as("offset"),
        sum(col("__bt")).as("total"))
  }

  /** (value, ecdf) per distinct value, ecdf = fraction of rows <= value.
    * The distinct-value counts are lazily localCheckpoint'ed: the bounds
    * action, the offsets subtree, and the window stage all read the blocks
    * of one aggregation pass instead of re-scanning the input (GC-scoped —
    * no CacheManager pin). */
  def ecdf(df: DataFrame, value: Column, buckets: Int = DefaultBuckets): DataFrame = {
    val counts = df.select(value.cast("double").as("value"))
      .where(col("value").isNotNull)
      .groupBy("value").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    // Bounds pass: balance by DISTINCT values (the window stage sees one
    // row per distinct value, so that is the load to spread).
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else counts.stat.approxQuantile("value", probs, 0.01).distinct.sorted
    val withBucket = counts.withColumn("bucket", bucketCol(col("value"), bounds))
    val btot = withBucket.groupBy("bucket").agg(sum("cnt").as("t"))
    val off = bucketOffsets(btot, Seq.empty)
    val w = Window.partitionBy("bucket").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withBucket
      .withColumn("local", sum("cnt").over(w))
      .join(broadcast(off), Seq("bucket"))
      .select(col("value"),
        ((col("local") + col("offset")) / col("total")).as("ecdf"))
  }

  /** Exact quantile cutoffs for sorted thresholds in (0, 1].
    * Returns one cutoff per threshold; +Infinity for all on empty input. */
  def computeQuantiles(df: DataFrame, value: Column, thresholds: Array[Double]): Array[Double] = {
    val e = ecdf(df, value).where(col("ecdf") >= thresholds.min)
    // min value per threshold, evaluated in one aggregate pass over the
    // (small) distinct-value ECDF frame.
    val aggs = thresholds.zipWithIndex.map { case (t, i) =>
      min(when(col("ecdf") >= t, col("value"))).as(s"q$i")
    }
    val row = e.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
    thresholds.indices.map { i =>
      if (row.isNullAt(i)) Double.PositiveInfinity else row.getDouble(i)
    }.toArray
  }

  def computeDeciles(df: DataFrame, value: Column): Array[Double] =
    computeQuantiles(df, value, Deciles)

  def computeQuintiles(df: DataFrame, value: Column): Array[Double] =
    computeQuantiles(df, value, Quintiles)

  /** One cut-set to compute in a fused pass: (feature name, value column,
    * thresholds, optional row predicate — e.g. "only positive lengths"). */
  final case class CutSpec(name: String, value: Column,
                           thresholds: Array[Double], filter: Option[Column] = None)

  /** Fused multi-column exact quantiles: ONE wide scan + shuffle for any
    * number of cut-sets (the reference ran a full pass per cut-set — 3 for
    * flow, 5 for dns: Quantiles.scala:85-94 callers), plus the cheap bounds
    * pass over the distinct-value counts. Values are tagged with their
    * feature name, counted once, range-bucketed per feature (bounds from a
    * single `percentile_approx` aggregate, collected as literals), and the
    * running sum is windowed per (feature, bucket) — parallel bounded
    * frames, never a single-partition window. Per-spec filters become
    * null-outs so excluded rows never shuffle. */
  def computeCutSets(df: DataFrame, specs: Seq[CutSpec],
                     buckets: Int = DefaultBuckets): Map[String, Array[Double]] = {
    val tagged = df.select(explode(array(specs.map { s =>
        val v = s.filter match {
          case Some(p) => when(p, s.value.cast("double"))
          case None => s.value.cast("double")
        }
        struct(lit(s.name).as("feature"), v.as("value"))
      }: _*)).as("fv"))
      .select(col("fv.feature").as("feature"), col("fv.value").as("value"))
      .where(col("value").isNotNull)
    // Cache ONLY the bounded distinct-value counts across the bounds action
    // and the final cutoff action; unpersisted before return (recomputation
    // would be deterministic anyway — exact groupBy + literal buckets).
    val counts = tagged.groupBy("feature", "value").agg(count(lit(1)).as("cnt"))
      .cache()
    try {
      val probs = (1 until buckets).map(_.toDouble / buckets)
      val boundsByFeature: Map[String, Array[Double]] =
        if (probs.isEmpty) Map.empty
        else counts.groupBy("feature")
          .agg(percentile_approx(col("value"), typedlit(probs), lit(10000)).as("bs"))
          .collect()
          .map(r => r.getString(0) ->
            r.getSeq[Double](1).toArray.distinct.sorted)
          .toMap
      val bucket = specs.map(_.name).foldRight(lit(0)) { (f, acc) =>
        when(col("feature") === f,
          bucketCol(col("value"), boundsByFeature.getOrElse(f, Array.empty)))
          .otherwise(acc)
      }
      val withBucket = counts.withColumn("bucket", bucket)
      val btot = withBucket.groupBy("feature", "bucket").agg(sum("cnt").as("t"))
      val off = bucketOffsets(btot, Seq("feature"))
      val wCum = Window.partitionBy("feature", "bucket").orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ecdfDF = withBucket
        .withColumn("local", sum("cnt").over(wCum))
        .join(broadcast(off), Seq("feature", "bucket"))
        .withColumn("ecdf", (col("local") + col("offset")) / col("total"))
      val spark = df.sparkSession
      import spark.implicits._
      val th = specs.flatMap(s => s.thresholds.map(t => (s.name, t)))
        .toDF("feature", "threshold")
      val rows = ecdfDF.join(broadcast(th), "feature")
        .where(col("ecdf") >= col("threshold"))
        .groupBy("feature", "threshold")
        .agg(min("value").as("cutoff"))
        .as[(String, Double, Double)].collect()
      val byFeature = rows.groupBy(_._1).map { case (f, rs) =>
        f -> rs.map(r => (r._2, r._3)).toMap
      }
      specs.map { s =>
        val m = byFeature.getOrElse(s.name, Map.empty[Double, Double])
        s.name -> s.thresholds.map(t => m.getOrElse(t, Double.PositiveInfinity))
      }.toMap
    } finally counts.unpersist(blocking = false)
  }

  /** Scale path: single-pass mergeable sketch (no global sort, no window).
    * relativeError=0 forces exact computation in Spark but costs memory;
    * the default 1e-4 is the 100 TB setting. */
  def approxQuantiles(df: DataFrame, colName: String, thresholds: Array[Double],
                      relativeError: Double = 1e-4): Array[Double] = {
    val res = df.na.drop(Seq(colName)).stat.approxQuantile(colName, thresholds, relativeError)
    if (res.isEmpty) Array.fill(thresholds.length)(Double.PositiveInfinity) else res
  }
}
