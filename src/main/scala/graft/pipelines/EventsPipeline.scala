package graft.pipelines

import graft.functions.Binning
import graft.ml.TopicModel
import graft.operators.{Corpus, Quantiles, Scoring}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The suspicious-connects dataflow applied to the generic `events` table
  * (event_id, ts, user_id, event_type, value, props): document = user,
  * word = eventType_hourBin_valueQuintile. This is the flagship end-to-end
  * query — the same featurize → corpus → LDA → score → top-k shape as the
  * flow/dns/proxy pipelines, runnable on the harness testdata.
  */
object EventsPipeline {

  final case class Cuts(hour: Array[Double], value: Array[Double])
  final case class Model(cuts: Cuts, topics: TopicModel.Model, topicCount: Int)

  /** Both cut-sets in one scan+shuffle (exact ECDF semantics). */
  def computeCuts(events: DataFrame): Cuts = {
    val cuts = Quantiles.computeCutSets(events, Seq(
      Quantiles.CutSpec("hour", hour(col("ts")), Quantiles.Deciles),
      Quantiles.CutSpec("value", col("value"), Quantiles.Quintiles)))
    Cuts(hour = cuts("hour"), value = cuts("value"))
  }

  /** Sketch-based cuts — the high-cardinality/100 TB path: `value` is
    * continuous, so the exact ECDF windows over every distinct value;
    * the mergeable sketch takes one pass with bounded memory. */
  def computeCutsApprox(events: DataFrame): Cuts = {
    val withCols = events.select(hour(col("ts")).cast("double").as("h"),
      col("value").cast("double").as("v"))
    Cuts(
      hour = Quantiles.approxQuantiles(withCols, "h", Quantiles.Deciles),
      value = Quantiles.approxQuantiles(withCols, "v", Quantiles.Quintiles))
  }

  def featurize(events: DataFrame, cuts: Cuts): DataFrame =
    events
      .withColumn("ev_hour", hour(col("ts")).cast("double"))
      .withColumn("word", concat_ws("_",
        col("event_type"),
        Binning.binCol(col("ev_hour"), cuts.hour.toSeq),
        Binning.binCol(col("value"), cuts.value.toSeq)))

  def train(events: DataFrame, topicCount: Int = 10, alpha: Double = 2.5,
            seed: Long = 42L, maxIter: Int = 10,
            exactCuts: Boolean = true,
            layoutPartitions: Int = TopicModel.TrainLayoutPartitions): Model = {
    val cuts = if (exactCuts) computeCuts(events) else computeCutsApprox(events)
    val feats = featurize(events, cuts)
    val wc = Corpus.wordCounts(feats, col("user_id"), col("word"))
    Model(cuts, TopicModel.train(wc, topicCount, alpha, seed, maxIter,
      layoutPartitions = layoutPartitions), topicCount)
  }

  def score(events: DataFrame, model: Model): DataFrame =
    Scoring.score(featurize(events, model.cuts), col("user_id"), col("word"), model.topics)

  /** Train + score + ascending top-k with deterministic tiebreak. */
  def run(events: DataFrame, threshold: Double = 1.0, topK: Int = 100,
          topicCount: Int = 10, seed: Long = 42L,
          exactCuts: Boolean = true): DataFrame = {
    val model = train(events, topicCount = topicCount, seed = seed,
      exactCuts = exactCuts)
    Scoring.suspicious(
      score(events, model).select("event_id", "user_id", "event_type", "word", "score"),
      threshold, topK, tiebreak = Seq(col("event_id")))
  }

  /** Training-quality assertion: the trained model's perplexity on its own
    * corpus must not exceed `maxRatio` × the uniform baseline (= vocabulary
    * size — see [[TopicModel.perplexity]]: a uniform model scores exactly
    * |vocab|). The events corpus is deliberately FLAT (decile/quintile bins
    * are equal-mass by construction), so a trained model only beats uniform
    * by the corpus's residual structure — the ratio bound catches a model
    * that is WORSE than knowing nothing (zeroed gammas, shuffled joins,
    * degenerate topics), not optimizer noise. Throws IllegalStateException
    * → the driver's rows-only gate records a non-null err. */
  /** Pinned training-quality band: trained perplexity must stay below
    * this fraction of the uniform baseline. Derivation: the seeded,
    * deterministic trainer measures ratio 0.9818 on the sf0.01 gate
    * corpus (0.95-0.97 at sf0.001); the band sits at the midpoint
    * between healthy and uniform, so a HALF-degraded model — one the
    * old "≤ uniform" bound silently accepted — now flips the gate's
    * err non-null, while the healthy value keeps ~1% headroom. The
    * events corpus is deliberately flat (equal-mass bins), which is why
    * healthy sits so close to 1.0 here; pipelines with more corpus
    * structure pin far tighter (flow 0.71, proxy 0.92). */
  val PerplexityBand: Double = 0.991

  def assertQuality(model: Model, events: DataFrame,
                    maxRatio: Double = PerplexityBand): Unit =
    TopicModel.assertQuality(model.topics,
      Corpus.wordCounts(featurize(events, model.cuts),
        col("user_id"), col("word")),
      maxRatio, label = "events LDA")

  /** The measured perplexity/uniform ratio [[assertQuality]] bounds —
    * exposed so the driver gate can emit the value as evidence columns
    * next to its rows-only check (see pipe_events_suspicious). */
  def qualityRatio(model: Model, events: DataFrame): Double =
    TopicModel.qualityRatio(model.topics,
      Corpus.wordCounts(featurize(events, model.cuts),
        col("user_id"), col("word")),
      label = "events LDA")

  /** [[run]] with the quality gate inline: LDA has no SQL twin, so the
    * driver's correctness check on this pipeline is rows-only — the
    * perplexity bound turns a silent training regression into a gate
    * failure. */
  def runChecked(events: DataFrame, threshold: Double = 1.0, topK: Int = 100,
                 topicCount: Int = 10, seed: Long = 42L,
                 exactCuts: Boolean = true,
                 maxRatio: Double = PerplexityBand): DataFrame = {
    val model = train(events, topicCount = topicCount, seed = seed,
      exactCuts = exactCuts)
    assertQuality(model, events, maxRatio)
    Scoring.suspicious(
      score(events, model).select("event_id", "user_id", "event_type", "word", "score"),
      threshold, topK, tiebreak = Seq(col("event_id")))
  }
}
