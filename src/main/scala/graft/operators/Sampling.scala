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

  /** Deterministic shuffle into training SHARDS — the last step before a
    * training run reads the corpus: N shard files, each internally
    * pseudo-randomly ordered, no global sort. shard = hash(seed:key) mod
    * numShards (seed varies the permutation between epochs/runs without
    * RNG state); pos = rank within the shard by (hash, key). Returns the
    * input columns plus (shard, pos).
    *
    * Scale shape: one narrow shuffle on `shard` then a per-shard sort —
    * exactly the cost of writing the shard files themselves
    * (`repartition(shard).sortWithinPartitions` / a partitioned sorted
    * write), and parallelism = numShards, which a real pipeline sizes to
    * its file-size budget (hundreds to thousands at 100 TB). The
    * alternative — one global orderBy ([[deterministicShuffle]]) — pays
    * a range exchange AND still writes per-file; this does neither. */
  def shuffleShards(df: DataFrame, key: Column, numShards: Int,
                    seed: String = ""): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val h = PolyHash.poly_hash(
      concat(lit(seed), lit(":"), key.cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard")).orderBy(col("__h"), key)
    df.withColumn("__h", h)
      .withColumn("__shard", (col("__h") % numShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .withColumn("shard", col("__shard"))
      .drop("__h", "__shard")
  }

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

  /** Temperature-scaled mixture TARGETS (the multilingual sampling rule
    * of mT5 / XLM-R: draw class l with probability ∝ n_l^α, α < 1
    * flattening the head so low-resource classes aren't drowned). Given
    * per-class counts n_l, weight_l = n_l^α / Σ n_l^α (6-dp-rounded —
    * the engine-wide cross-engine contract for one IEEE `pow` + one
    * division), target_l = ⌊totalTarget · weight_l + 0.5⌋, capped at n_l
    * (a shortfall is visible, never rebalanced — [[mixture]]'s rule).
    * One tiny aggregation (|classes| rows, broadcastable); pair with
    * [[mixture]] to materialize the selection. Output per class:
    * (class, n_docs, weight, target). */
  def temperatureTargets(df: DataFrame, cls: Column, alpha: Double,
                         totalTarget: Long): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(totalTarget >= 0, s"totalTarget must be >= 0, got $totalTarget")
    val counts = df.groupBy(cls.as("class")).agg(count(lit(1)).as("n_docs"))
    val wRaw = pow(col("n_docs").cast("double"), lit(alpha))
    val denom = counts.agg(sum(pow(col("n_docs").cast("double"), lit(alpha)))
      .as("denom"))
    counts.crossJoin(broadcast(denom))
      .select(col("class"), col("n_docs"),
        (floor((wRaw / col("denom")) * 1000000 + 0.5) / 1000000.0).as("weight"))
      .withColumn("target",
        least(floor(lit(totalTarget.toDouble) * col("weight") + 0.5).cast("long"),
          col("n_docs")))
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

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): pick the `topK`
    * source-pool documents whose hashed-bigram feature distribution looks
    * most like a TARGET corpus. Features are token bigrams hashed into
    * `numBuckets` buckets ([[PolyHash]] — engine-stable); each corpus
    * gets an additive-smoothed unigram model over buckets
    * p(b) = (c(b)+1)/(N+B); a document's score is the mean per-feature
    * log importance ratio ln p_target(b) − ln p_source(b), each log
    * 6-dp-rounded to an integer so the cross-engine sum is exact and the
    * one final division is deterministic IEEE (the x16 bigram-LM
    * discipline). Deterministic rank (score desc, id asc) replaces the
    * paper's Gumbel resampling — reproducibility over noise injection.
    *
    * Scale shape: bigrams are narrow rows; both bucket models aggregate
    * map-side to ≤ `numBuckets` rows and BROADCAST back to the per-doc
    * score aggregation; the final top-k is TakeOrdered — no shuffle grows
    * with the corpus beyond the doc-keyed feature count. */
  def dsirSelect(docs: DataFrame, id: Column, text: Column, isTarget: Column,
                 numBuckets: Int = 1024, topK: Int = 50): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    require(topK > 0, "topK must be positive")
    val toks = docs.select(id.cast("long").as("doc_id"),
      isTarget.cast("boolean").as("is_target"),
      posexplode(graft.functions.TextFunctions.tokens(text))
        .as(Seq("pos", "token")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    // per-(doc, bucket) feature counts — the only corpus-sized aggregation
    val feats = toks.withColumn("nxt", lead("token", 1).over(w))
      .where(col("nxt").isNotNull)
      .select(col("doc_id"), col("is_target"),
        (PolyHash.poly_hash(concat(col("token"), lit(" "), col("nxt")))
          % numBuckets).as("b"))
      .groupBy("doc_id", "is_target", "b").agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // feeds both bucket models and doc scoring
    // corpus bucket models: ≤ numBuckets rows each, exact integer counts
    def model(target: Boolean) = feats.where(col("is_target") === target)
      .groupBy("b").agg(sum("c").as("cnt"))
    // both corpus totals in ONE job over the checkpointed narrow rows
    val totals = feats.groupBy("is_target").agg(sum("c").as("n"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val nT = totals.getOrElse(true, 0L)
    val nS = totals.getOrElse(false, 0L)
    def l6(cnt: Column, n: Long) = floor(
      log((coalesce(cnt, lit(0L)) + 1).cast("double") / (n + numBuckets).toDouble)
        * 1000000 + 0.5).cast("long")
    val deltas = model(target = true).withColumnRenamed("cnt", "ct")
      .join(model(target = false).withColumnRenamed("cnt", "cs"), Seq("b"), "full_outer")
      .select(col("b"), (l6(col("ct"), nT) - l6(col("cs"), nS)).as("d_int"))
    val scored = feats.where(!col("is_target"))
      .join(broadcast(deltas), "b")
      .groupBy("doc_id")
      .agg(sum(col("c") * col("d_int")).as("s_int"), sum("c").as("n_feats"))
      .withColumn("avg_logw",
        col("s_int").cast("double") / col("n_feats") / 1000000.0)
    // TakeOrdered top-k, then rank within the k driver-bounded rows
    val top = scored.orderBy(col("avg_logw").desc, col("doc_id")).limit(topK)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("avg_logw").desc, col("doc_id"))).cast("int"))
      .select("doc_id", "n_feats", "avg_logw", "rank")
  }

  /** Avalanche-mixed deterministic uniform draw in (0,1] for a key —
    * the RNG-free uniform behind [[weightedSample]]. The raw rolling
    * hash is NOT usable as a uniform: keys sharing a prefix differ only
    * in their final characters, which the fold barely mixes
    * (ph("t:10")..ph("t:19") are CONSECUTIVE integers — measured: A-ES
    * over sequential ids selected an id-contiguous block). Two extra
    * engine-replayable steps fix it: an overflow-safe multiplicative
    * scramble h·A mod P (split at 2¹⁶ so every product stays < 2⁶³),
    * then a second rolling hash over the REVERSED decimal string — the
    * reverse feeds the scramble's high-entropy digits through the
    * fold's full 31^k mixing, breaking the scramble's residual lattice.
    * Measured over 100k sequential keys: mean 0.4988, stdev 0.2885
    * (uniform: 0.5, 0.2887). */
  def uniformHash(key: Column, seed: String): Column = {
    val h1 = PolyHash.poly_hash(concat(lit(seed), lit(":"), key.cast("string")))
    // (h1 * 2654435761) mod P without 64-bit overflow: lo·(A mod P) +
    // hi·(2^16·A mod P), with A mod P = 654435747, (65536·A) mod P =
    // 100815169
    val h2 = (pmod(h1, lit(65536L)) * lit(654435747L) +
      shiftright(h1, 16) * lit(100815169L)) % lit(PolyHash.Prime)
    val h = PolyHash.poly_hash(reverse(h2.cast("string")))
    (h + 1).cast("double") / lit(PolyHash.Prime.toDouble)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir", algorithm A-ES): each
    * row draws an exponential arrival time t = −ln(u)/w from a uniform
    * u ∈ (0,1], and the k smallest arrival times are exactly a weighted
    * sample without replacement. The uniform is the engine-stable
    * [[uniformHash]], not RNG, so the sample is reproducible across
    * runs, engines and partitionings and membership is decidable per
    * row. The score is 6-dp fixed-pointed (one ln + one division — the
    * repo's IEEE-parity contract) and ties break on the key, so
    * selection is a total order. Rows with non-positive weight are
    * EXCLUDED (zero weight means never sample; A-ES is undefined
    * there).
    *
    * Scale shape: map-only scoring plus one TakeOrderedAndProject — the
    * k-bounded heap per partition, no global sort, nothing grows with
    * the corpus but the scan. Output: input columns + `es_score`. */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     k: Int, seed: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val score = floor(-log(uniformHash(key, seed)) / weight.cast("double")
      * 1000000 + 0.5).cast("long")
    df.where(weight.cast("double") > 0)
      .withColumn("es_score", score)
      .orderBy(col("es_score"), key)
      .limit(k)
  }
}
