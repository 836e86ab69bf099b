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
  * Scale notes: the ECDF is `groupBy(value).count()` (map-side partial
  * aggregation) followed by a running sum. The running sum is a window over
  * the *distinct values*, not the raw rows — for binned/discretized feature
  * domains that's a small frame. For genuinely high-cardinality columns at
  * 100 TB use [[approxQuantiles]] (a single pass, mergeable sketch,
  * relative-error bound) — the exact path exists for reference-semantics
  * parity and small/medium cardinality domains.
  */
object Quantiles {

  val Deciles: Array[Double] = Array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0)
  val Quintiles: Array[Double] = Array(0.2, 0.4, 0.6, 0.8, 1.0)

  /** (value, ecdf) per distinct value, ecdf = fraction of rows <= value. */
  def ecdf(df: DataFrame, value: Column): DataFrame = {
    val counts = df.select(value.cast("double").as("value"))
      .where(col("value").isNotNull)
      .groupBy("value").agg(count(lit(1)).as("cnt"))
    // Global window over distinct values only; cheap for discretized domains.
    val w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("total", sum("cnt").over(Window.partitionBy()))
      .select(col("value"), (col("cum") / col("total")).as("ecdf"))
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

  /** Fused multi-column exact quantiles: ONE scan + ONE shuffle for any
    * number of cut-sets (the reference ran a full pass per cut-set — 3 for
    * flow, 5 for dns: Quantiles.scala:85-94 callers). Values are tagged
    * with their feature name, counted once, windowed per feature, and the
    * tiny (feature, threshold, cutoff) result collected in one action.
    * Per-spec filters become null-outs so excluded rows never shuffle. */
  def computeCutSets(df: DataFrame, specs: Seq[CutSpec]): Map[String, Array[Double]] = {
    val tagged = df.select(explode(array(specs.map { s =>
        val v = s.filter match {
          case Some(p) => when(p, s.value.cast("double"))
          case None => s.value.cast("double")
        }
        struct(lit(s.name).as("feature"), v.as("value"))
      }: _*)).as("fv"))
      .select(col("fv.feature").as("feature"), col("fv.value").as("value"))
      .where(col("value").isNotNull)
    val counts = tagged.groupBy("feature", "value").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("feature").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ecdfDF = counts
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("total", sum("cnt").over(Window.partitionBy("feature")))
      .withColumn("ecdf", col("cum") / col("total"))
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
