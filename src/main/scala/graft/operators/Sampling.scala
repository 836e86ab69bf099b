package graft.operators

import graft.functions.PolyHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling and splits for training-data pipelines.
  *
  * All based on hash-mod bucketing of a stable key — not RNG — so samples
  * are deterministic across runs, engines, partitionings, and cluster
  * sizes; membership is decidable per row with no global state. This is
  * the standard technique for stable train/val/test splits at scale.
  */
object Sampling {

  /** Bucket 0..buckets-1 for a key (polynomial hash mod buckets). */
  def bucket(key: Column, buckets: Int): Column =
    PolyHash.poly_hash(key.cast("string")) % buckets

  /** Deterministic p-out-of-buckets sample: keeps rows whose bucket is
    * below `keep`. keep=10, buckets=100 ≈ a stable 10% sample. */
  def hashSample(df: DataFrame, key: Column, keep: Int, buckets: Int = 100): DataFrame =
    df.where(bucket(key, buckets) < keep)

  /** Named splits by cumulative bucket shares, e.g.
    * splits(df, key, Seq("train" -> 80, "val" -> 10, "test" -> 10)):
    * adds a `split` column; shares must sum to the bucket count. */
  def splits(df: DataFrame, key: Column,
             shares: Seq[(String, Int)], buckets: Int = 100): DataFrame = {
    require(shares.map(_._2).sum == buckets,
      s"split shares must sum to $buckets")
    val b = bucket(key, buckets)
    val cum = shares.scanLeft(0)(_ + _._2).tail
    val expr = shares.zip(cum).foldRight(lit(null).cast("string")) {
      case (((name, _), hi), els) => when(b < hi, lit(name)).otherwise(els)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic reshuffle: a stable pseudo-random row order (sort by
    * key hash) — reproducible training-data interleaving without RNG. */
  def deterministicShuffle(df: DataFrame, key: Column): DataFrame =
    df.orderBy(PolyHash.poly_hash(key.cast("string")), key)

  /** Deterministic data-mixture construction: per-class target COUNTS
    * (the mixing-weights step of a training-data pipeline — "60k docs of
    * web, 30k of code, ..."). Rows rank within their class by (key hash,
    * key) — the same stable pseudo-random order as [[balanceClasses]] —
    * and each class keeps its first `targets(class)` rows; classes
    * absent from `targets` are dropped. A class smaller than its target
    * keeps everything (and the shortfall is visible in the output
    * counts, never silently rebalanced). */
  def mixture(df: DataFrame, key: Column, cls: Column,
              targets: Map[String, Long]): DataFrame = {
    require(targets.values.forall(_ >= 0), "targets must be non-negative")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(cls).orderBy(PolyHash.poly_hash(key.cast("string")), key)
    val limit = targets.toSeq.sortBy(_._1).foldRight(lit(0L)) {
      case ((c, t), els) => when(cls === c, lit(t)).otherwise(els)
    }
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= limit)
      .drop("__rn")
  }

  /** Deterministic per-class downsampling to at most `target` rows — the
    * class-balancing step for skewed training labels. Rows rank within
    * their class by (key hash, key): a stable pseudo-random order, so the
    * kept subset is reproducible across runs/engines/partitionings. One
    * shuffle (the per-class window); a very hot class funnels through one
    * partition's sort — for targets small relative to the class, that sort
    * is the k-limited TakeOrdered shape per class and stays cheap. */
  def balanceClasses(df: DataFrame, key: Column, cls: Column,
                     target: Int): DataFrame = {
    require(target > 0, "target must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(cls).orderBy(PolyHash.poly_hash(key.cast("string")), key)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= target)
      .drop("__rn")
  }
}
