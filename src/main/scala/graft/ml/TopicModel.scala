package graft.ml

import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** In-JVM topic model replacing the reference's external MPI LDA process
  * (reference: OniLDACWrapper.scala:25-113 — driver dictionaries, model.dat
  * file exchange, ssh/scp corpus distribution, final.beta/final.gamma text
  * parsing). Here the corpus never leaves Spark: word indexing is a
  * DataFrame dictionary join, training is MLlib's LDA, and the model
  * surfaces as two DataFrames ready for broadcast joins.
  *
  * docConcentration defaults to 2.5 and k to 20, mirroring the reference's
  * operating point (reference: ml_ops.sh:67, OniLDACWrapper.scala:83).
  */
object TopicModel {

  /** doc → topic mixture P(topic|doc); word → per-topic P(word|topic). */
  final case class Model(
      docTopicMix: DataFrame,   // (doc: string, topic_mix: array<double>)
      wordTopicProb: DataFrame, // (word: string, topic_prob: array<double>)
      topicCount: Int)

  /** Train from a (doc, word, count) corpus. `optimizer`: "online"
    * (variational minibatch, default) or "em" (expectation-maximization,
    * closer to the reference's variational EM C binary). */
  /** Largest vocabulary the wordProb build may materialize on the driver:
    * vocabSize × k doubles (2^20 × 20 ≈ 168 MB). Discretized-feature
    * vocabularies are orders of magnitude below this; an open TEXT
    * vocabulary is not, and must fail loudly instead of OOMing the
    * driver mid-train. */
  val MaxDriverVocab: Int = 1 << 20

  /** Default partition count for the corpus handed to the LDA optimizer.
    * The online optimizer's minibatch sampling (and the doc-id assignment
    * MLlib derives via zipWithIndex) depend on the RDD's partition layout,
    * so a layout inherited from the session (core count → shuffle
    * partitions) makes "same seed" reproducible only within one session
    * config. Training therefore pins its input to a CONSTANT hash layout —
    * `repartition(layoutPartitions, col("doc"))` +
    * `sortWithinPartitions("doc")` — a pure function of the data, so the
    * same corpus + seed trains the identical model under local[4],
    * local[32], or a 1000-executor cluster.
    *
    * FIXTURE CONTRACT: the committed pipeline goldens
    * (src/test/resources/golden/pipe_*) were trained at THIS default; a
    * different `layoutPartitions` trains a numerically different (equally
    * valid) model. Crawl-scale corpora should widen `layoutPartitions` to
    * match cluster parallelism — reproducibility holds at any fixed value,
    * it is only tied to the VALUE chosen, not to 64. */
  val TrainLayoutPartitions: Int = 64

  /** The top-`cap` words of a (word, cnt) corpus by TOTAL corpus count
    * (ties broken lexicographically), as a dense dictionary in the same
    * lexicographic id order [[ModelIO.denseWordIds]] assigns. Fully
    * distributed: the frequency cut is a map-side-combined aggregate plus
    * a TakeOrdered top-k — an OPEN text vocabulary of any size reduces to
    * a bounded dictionary without the driver ever seeing the long tail. */
  def cappedWordIds(corpus: DataFrame, cap: Int): DataFrame = {
    val kept = corpus
      .groupBy(col("word")).agg(sum(col("cnt")).as("__total"))
      .orderBy(desc("__total"), asc("word"))
      .limit(cap)
      .select("word")
    ModelIO.denseWordIds(kept)
  }

  /** Train from a (doc, word, count) corpus.
    *
    * `vocabCap`: when set, the vocabulary is frequency-capped to the top-N
    * words first (see [[cappedWordIds]]) and out-of-vocabulary words DROP
    * from the corpus — the standard open-vocabulary LDA preprocessing, and
    * the path that lets raw text corpora (unbounded distinct words) train
    * with bounded driver memory. Scoring then sees unseen words through
    * the uniform-default path, exactly like unseen docs. When unset, the
    * vocabulary must already be bounded (discretized feature words) and
    * the `maxDriverVocab` guard fails loudly otherwise.
    *
    * `layoutPartitions`: the pinned training-input layout (see
    * [[TrainLayoutPartitions]] for the reproducibility + fixture
    * contract). Any fixed value is layout-invariant across session
    * configs; widen it on large clusters so LDA-fit input parallelism
    * is not capped at 64 tasks. */
  def train(wordCounts: DataFrame, topicCount: Int = 20, alpha: Double = 2.5,
            seed: Long = 42L, maxIter: Int = 20,
            optimizer: String = "online",
            maxDriverVocab: Int = MaxDriverVocab,
            vocabCap: Option[Int] = None,
            layoutPartitions: Int = TrainLayoutPartitions): Model = {
    require(layoutPartitions > 0,
      s"layoutPartitions must be positive, got $layoutPartitions")
    val spark = wordCounts.sparkSession
    import spark.implicits._

    val corpus = wordCounts.select(
      col("doc").cast("string").as("doc"),
      col("word").cast("string").as("word"),
      col("count").cast("double").as("cnt"))
      .cache()

    // Dictionary = dense sorted word ids, assigned distributedly
    // (range-sort + zipWithIndex — no single-partition window); replaces
    // the reference's driver-side collect into a Map. With vocabCap the
    // dictionary is the frequency-capped top-N instead of the full vocab.
    val dict = vocabCap.fold(ModelIO.denseWordIds(corpus.select("word")))(
        cap => cappedWordIds(corpus, cap))
      .cache()
    val vocabSize = dict.count().toInt
    require(vocabSize <= maxDriverVocab,
      s"vocabulary has $vocabSize distinct words, above the $maxDriverVocab " +
        "driver cap for the topicsMatrix materialization. This model is " +
        "designed for DISCRETIZED feature vocabularies (bounded by the " +
        "product of bin counts); for open text vocabularies pass " +
        "vocabCap (frequency-capped top-N dictionary), or raise " +
        "maxDriverVocab knowingly.")

    // inner join: out-of-vocabulary words (capped mode only) drop here
    val docVectors = corpus.join(dict, "word")
      .groupBy("doc")
      .agg(collect_list(struct(col("word_id"), col("cnt"))).as("pairs"))
      .map { row =>
        val doc = row.getString(0)
        val pairs = row.getSeq[Row](1)
          .map(r => (r.getInt(0), r.getDouble(1)))
          .sortBy(_._1)
        (doc, Vectors.sparse(vocabSize, pairs.map(_._1).toArray, pairs.map(_._2).toArray))
      }.toDF("doc", "features")
      // Pin the optimizer's input to a layout that is a pure function of
      // the data (see [[TrainLayoutPartitions]]): hash-partition on doc,
      // totally ordered within each partition (docs are unique after the
      // groupBy). Explicit numPartitions also keeps AQE from re-coalescing
      // the layout at runtime.
      .repartition(layoutPartitions, col("doc"))
      .sortWithinPartitions("doc")
      .cache()

    // EM's docConcentration must be > 1; online accepts any positive.
    val lda = new LDA()
      .setK(topicCount)
      .setDocConcentration(alpha)
      .setSeed(seed)
      .setMaxIter(maxIter)
      .setOptimizer(optimizer)
      .setFeaturesCol("features")
    val ldaModel = lda.fit(docVectors)

    // Materialize the (bounded) model frames, then release the training
    // intermediates — scoring only ever touches docMix/wordProb, so the
    // corpus/dictionary/vector caches would otherwise pin storage for the
    // session lifetime.
    val docMix = ldaModel.transform(docVectors)
      .select(col("doc"), vector_to_array(col("topicDistribution")).cast("array<double>").as("topic_mix"))
      .cache()
    docMix.count()

    // topicsMatrix is vocabSize x k; for the online optimizer it is the
    // unnormalized variational topic-term matrix, so normalize each topic
    // column to a proper P(word|topic) distribution. The discretized
    // vocabulary is inherently small, so materializing it on the driver
    // and re-joining through the dictionary is bounded work.
    val tm = ldaModel.topicsMatrix
    val colSums = (0 until topicCount).map { t =>
      val s = (0 until vocabSize).map(w => tm(w, t)).sum
      if (s == 0.0) 1.0 else s
    }
    val rows = (0 until vocabSize).map { w =>
      (w, (0 until topicCount).map(t => tm(w, t) / colSums(t)).toArray)
    }
    val wordProb = spark.createDataFrame(rows).toDF("word_id", "topic_prob")
      .join(dict, "word_id")
      .select("word", "topic_prob")
      .cache()
    wordProb.count()

    docVectors.unpersist()
    dict.unpersist()
    corpus.unpersist()
    Model(docMix, wordProb, topicCount)
  }

  /** Corpus perplexity under the model's scoring distribution
    * P(word|doc) = Σ_t P(t|doc)·P(word|t):
    * exp( -Σ cnt·ln P / Σ cnt ), lower is better; a uniform model scores
    * exactly the vocabulary size. Unseen docs/words take the same uniform
    * 1/k default the scoring path uses ([[graft.operators.Scoring]]), and
    * probabilities are floored at 1e-300 so a zero-gamma doc (the
    * reference's empty-doc case) degrades to a huge-but-finite penalty
    * instead of -Inf. Fully relational — two joins and one aggregate — so
    * it runs at corpus scale; this is the regression metric TopicModelSpec
    * pins (LDA training has no exact oracle, but its QUALITY is
    * measurable). */
  def perplexity(model: Model, wordCounts: DataFrame): Double = {
    val k = model.topicCount
    val uniform = array((0 until k).map(_ => lit(1.0 / k)): _*)
    val corpus = wordCounts.select(
      col("doc").cast("string").as("__d"),
      col("word").cast("string").as("__w"),
      col("count").cast("double").as("__cnt"))
    val mixes = model.docTopicMix.withColumnRenamed("doc", "__doc")
    val probs = model.wordTopicProb.withColumnRenamed("word", "__word")
    val p = graft.functions.VectorOps.dot_product(
      coalesce(col("topic_mix"), uniform),
      coalesce(col("topic_prob"), uniform))
    val r = corpus
      .join(mixes, col("__d") === col("__doc"), "left")
      .join(probs, col("__w") === col("__word"), "left")
      .agg(
        sum(col("__cnt") * log(greatest(p, lit(1e-300)))).as("ll"),
        sum(col("__cnt")).as("n"))
      .head()
    math.exp(-r.getDouble(0) / r.getDouble(1))
  }

  /** Training-quality tripwire shared by every LDA pipeline gate: the
    * trained model's [[perplexity]] on its own corpus must not exceed
    * `maxRatio` × the uniform baseline (= vocabulary size — a uniform
    * model scores exactly |vocab|). A trained model can only be WORSE
    * than knowing nothing through a genuine defect (zeroed gammas,
    * shuffled joins, degenerate topics), so the bound catches silent
    * training regressions without pinning optimizer noise. Throws
    * IllegalStateException → a driver rows-only gate records a non-null
    * err instead of passing on row count alone. */
  def assertQuality(model: Model, wordCounts: DataFrame,
                    maxRatio: Double = 1.0, label: String = "LDA"): Unit = {
    val ratio = qualityRatio(model, wordCounts, label)
    if (ratio > maxRatio) throw new IllegalStateException(
      f"$label training-quality regression: perplexity ratio $ratio%.4f " +
        f"exceeds the $maxRatio%.3f x uniform-baseline bound")
  }

  /** The measured quality ratio behind [[assertQuality]]: trained
    * [[perplexity]] / uniform baseline (= vocabulary size). < 1.0 means
    * the model beats knowing nothing; exposed separately so the
    * no-SQL-twin pipeline gates can EMIT the measured value as evidence
    * (a column in the gate's dumped result) instead of only
    * asserting against the band. */
  def qualityRatio(model: Model, wordCounts: DataFrame,
                   label: String = "LDA"): Double = {
    val vocab = wordCounts.select("word").distinct().count().toDouble
    val pp = perplexity(model, wordCounts)
    System.err.println(f"[lda] $label perplexity=$pp%.4f uniform=$vocab%.0f " +
      f"ratio=${pp / vocab}%.4f")
    pp / vocab
  }

  /** Persist a trained model: both frames as parquet + a tiny JSON meta.
    * The reference persisted implicitly via final.beta/final.gamma text
    * files (OniLDACWrapper.scala:88-104); parquet keeps the exact doubles
    * (no decimal text round-trip) and scales with the doc count. */
  def save(model: Model, path: String): Unit = {
    val spark = model.docTopicMix.sparkSession
    import spark.implicits._
    // both frames may be lazily reading from this same path (a loaded
    // model re-saved in place) — swap via temp dir
    graft.sources.Sinks.overwriteParquetSafely(model.docTopicMix, s"$path/doc_topic_mix")
    graft.sources.Sinks.overwriteParquetSafely(model.wordTopicProb, s"$path/word_topic_prob")
    Seq(model.topicCount).toDF("topic_count")
      .write.mode("overwrite").json(s"$path/meta")
  }

  /** Load a model persisted by [[save]]; scores are bit-identical to the
    * pre-save model (parquet preserves doubles exactly). */
  def load(spark: SparkSession, path: String): Model = {
    val k = spark.read.json(s"$path/meta")
      .select("topic_count").head().getLong(0).toInt
    Model(spark.read.parquet(s"$path/doc_topic_mix"),
      spark.read.parquet(s"$path/word_topic_prob"), k)
  }
}
