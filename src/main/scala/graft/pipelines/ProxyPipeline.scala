package graft.pipelines

import graft.functions.{Binning, Domains, Entropy, TimeFunctions}
import graft.ml.TopicModel
import graft.operators.{Corpus, Quantiles, Scoring}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Proxy suspicious-connects pipeline.
  *
  * Reference dataflow: proxy/ProxySuspiciousConnectsModel.scala +
  * ProxyWordCreation.scala. Word = topDomainClass_timeBin_method_
  * uriEntropyBin_topLevelContentType_agentCountBin_respCodeFirstChar;
  * document = client IP. The reference collects user-agent counts to a
  * driver Map and looks them up in a UDF
  * (ProxySuspiciousConnectsModel.scala:45-48, ProxyWordCreation.scala:48);
  * here agent counts stay distributed as a broadcast-joined aggregate.
  */
object ProxyPipeline {

  final case class Cuts(time: Array[Double], entropy: Array[Double], agent: Array[Double])

  /** The popularity list is carried as a DISTRIBUTED (domain) frame (see
    * [[DnsPipeline.Model]] — same rationale: no driver funnel at any list
    * size). [[Model.popularDomains]] collects for bounded lists/tests. */
  final case class Model(cuts: Cuts, popular: DataFrame,
                         topics: TopicModel.Model, topicCount: Int) {
    def popularDomains: Set[String] =
      popular.collect().map(_.getString(0)).toSet
  }

  /** A driver Set as a popularity frame (the small-list convenience). */
  def popularFrame(spark: SparkSession, domains: Set[String]): DataFrame =
    DnsPipeline.popularFrame(spark, domains)

  /** Persist a trained model: topics via [[TopicModel.save]], cuts as
    * parquet (cuts can hold +Infinity — not JSON-representable), the
    * popularity list as its own distributed parquet. */
  def save(model: Model, path: String): Unit = {
    TopicModel.save(model.topics, s"$path/topics")
    val spark = model.topics.docTopicMix.sparkSession
    import spark.implicits._
    // same load-then-save guard as DnsPipeline.save
    graft.sources.Sinks.overwriteParquetSafely(
      model.popular.select(col("domain").cast("string").as("domain")),
      s"$path/popular")
    Seq((model.cuts.time.toSeq, model.cuts.entropy.toSeq,
      model.cuts.agent.toSeq, model.topicCount))
      .toDF("time_cuts", "entropy_cuts", "agent_cuts", "topic_count")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def load(spark: SparkSession, path: String): Model = {
    val meta = spark.read.parquet(s"$path/meta")
    val m = meta.head()
    def arr(n: String) = m.getAs[Seq[Double]](n).toArray
    // pre-move models carried the list as a meta column — migrate on read
    val popular =
      if (meta.columns.contains("popular_domains"))
        popularFrame(spark, m.getAs[Seq[String]]("popular_domains").toSet)
      else spark.read.parquet(s"$path/popular")
    Model(Cuts(arr("time_cuts"), arr("entropy_cuts"), arr("agent_cuts")),
      popular,
      TopicModel.load(spark, s"$path/topics"), m.getAs[Int]("topic_count"))
  }

  def validRows(proxy: DataFrame): DataFrame =
    proxy.where(col("p_date").isNotNull && col("p_time").isNotNull &&
      col("clientip").isNotNull)

  /** Adds seconds-of-day, URI entropy, and the per-agent event count.
    * The agent-frequency side is bounded by DISTINCT USER-AGENT STRINGS,
    * which is unbounded in real proxy logs (version churn puts tens of
    * millions of distincts in 100 TB), so the broadcast hint is
    * SIZE-GATED on the Catalyst estimate ([[Scoring.sizeGatedBroadcast]])
    * exactly like the doc-mix side of scoring — small inputs broadcast,
    * big inputs shuffle (or AQE-broadcast from the runtime size). */
  def withFeatures(proxy: DataFrame): DataFrame = {
    val agentCounts = proxy.groupBy(col("useragent"))
      .agg(count(lit(1)).as("agent_count"))
    proxy
      .withColumn("time_of_day", TimeFunctions.seconds_of_day(col("p_time")))
      .withColumn("uri_entropy", Entropy.string_entropy(col("fulluri")))
      .join(Scoring.sizeGatedBroadcast(agentCounts), Seq("useragent"), "left")
  }

  /** All three cut-sets in ONE scan+shuffle (reference:
    * ProxySuspiciousConnectsModel.scala:106-118 ran one pass each). */
  def computeCuts(withFeats: DataFrame): Cuts = {
    val cuts = Quantiles.computeCutSets(withFeats, Seq(
      Quantiles.CutSpec("time", col("time_of_day"), Quantiles.Deciles),
      Quantiles.CutSpec("entropy", col("uri_entropy"), Quantiles.Quintiles),
      Quantiles.CutSpec("agent", col("agent_count"), Quantiles.Quintiles)))
    Cuts(time = cuts("time"), entropy = cuts("entropy"), agent = cuts("agent"))
  }

  /** The non-domain word components, shared by both classing variants. */
  private def wordFrom(topDomain: org.apache.spark.sql.Column, cuts: Cuts) =
    concat_ws("_",
      topDomain,
      Binning.binCol(col("time_of_day"), cuts.time.toSeq),
      col("reqmethod"),
      Binning.binCol(col("uri_entropy"), cuts.entropy.toSeq),
      split(col("resconttype"), "/").getItem(0),
      Binning.binCol(col("agent_count").cast("double"), cuts.agent.toSeq),
      substring(col("respcode"), 1, 1))

  /** 7-component word (reference: ProxyWordCreation.scala:30-51). */
  def featurize(withFeats: DataFrame, cuts: Cuts, popularDomains: Set[String]): DataFrame =
    withFeats
      .withColumn("top_domain",
        Domains.top_domain_class(Domains.extract_domain(col("host")), popularDomains)
          .cast("string"))
      .withColumn("word", wordFrom(col("top_domain"), cuts))

  /** Broadcast-JOIN popularity classing — same words as [[featurize]], the
    * popular list as a broadcast frame instead of a driver-collected Set
    * (see [[DnsPipeline.featurizeWithLookup]]). */
  def featurizeWithLookup(withFeats: DataFrame, cuts: Cuts, popular: DataFrame,
                          safe: Set[String] = Set("intel")): DataFrame =
    withFeats
      .withColumn("__dom", Domains.extract_domain(col("host")))
      .join(broadcast(popular.select(col("domain").cast("string").as("__pop")).distinct()),
        col("__dom") === col("__pop"), "left")
      .withColumn("top_domain",
        when(col("__dom").isin(safe.toSeq: _*), lit(2))
          .when(col("__pop").isNotNull, lit(1))
          .otherwise(lit(0)).cast("string"))
      .drop("__pop", "__dom")
      .withColumn("word", wordFrom(col("top_domain"), cuts))

  /** Train, optionally folding in analyst feedback (proxy columns + a
    * `weight` column from [[graft.sources.Feedback]]): weights multiply
    * corpus counts instead of physically duplicating rows
    * (reference: ProxyFeedback.scala:53-68 flatMap ×N). */
  def train(proxy: DataFrame, popularDomains: Set[String] = Set.empty,
            topicCount: Int = 20, alpha: Double = 2.5,
            seed: Long = 42L, maxIter: Int = 20,
            feedback: Option[DataFrame] = None,
            layoutPartitions: Int = TopicModel.TrainLayoutPartitions): Model =
    trainWithLookup(proxy, popularFrame(proxy.sparkSession, popularDomains),
      topicCount, alpha, seed, maxIter, feedback, layoutPartitions)

  /** Train with a DISTRIBUTED popularity frame (the 100 TB-clean form —
    * the CLI default; [[train]] is the small-Set convenience). */
  def trainWithLookup(proxy: DataFrame, popular: DataFrame,
                      topicCount: Int = 20, alpha: Double = 2.5,
                      seed: Long = 42L, maxIter: Int = 20,
                      feedback: Option[DataFrame] = None,
                      layoutPartitions: Int = TopicModel.TrainLayoutPartitions): Model = {
    val base = validRows(proxy).withColumn("__w", lit(1L))
    val combined = feedback match {
      case Some(fb) => base.unionByName(
        validRows(fb).withColumn("__w", col("weight")).drop("weight"),
        allowMissingColumns = true)
      case None => base
    }
    val feats0 = withFeatures(combined)
    val cuts = computeCuts(feats0)
    val feats = featurizeWithLookup(feats0, cuts, popular)
    val wc = Corpus.wordCounts(feats, col("clientip"), col("word"), col("__w"))
    Model(cuts, popular, TopicModel.train(wc, topicCount, alpha, seed,
      maxIter, layoutPartitions = layoutPartitions), topicCount)
  }

  def score(proxy: DataFrame, model: Model): DataFrame = {
    val feats = featurizeWithLookup(withFeatures(validRows(proxy)),
      model.cuts, model.popular)
    Scoring.score(feats, col("clientip"), col("word"), model.topics)
  }

  /** Reference-shaped results (ProxySuspiciousConnectsAnalysis.scala:45-52):
    * the ORIGINAL input columns + word + score, ascending, top-K. */
  def results(proxy: DataFrame, model: Model,
              threshold: Double, topK: Int): DataFrame =
    Scoring.suspicious(score(proxy, model), threshold, topK)
      .select(proxy.columns.map(col) :+ col("word") :+ col("score"): _*)

  def run(proxy: DataFrame, threshold: Double = 1.0, topK: Int = -1,
          popularDomains: Set[String] = Set.empty,
          topicCount: Int = 20, seed: Long = 42L,
          feedback: Option[DataFrame] = None): DataFrame = {
    val model = train(proxy, popularDomains, topicCount, seed = seed,
      feedback = feedback)
    Scoring.suspicious(score(proxy, model), threshold, topK)
  }

  /** Pinned training-quality band ([[TopicModel.assertQuality]] ratio
    * bound): seeded healthy ratio measured 0.8470 on the sf0.01 gate
    * corpus; the band sits at the midpoint to uniform, so a model that
    * loses half the learned structure — including a 0.95×-uniform
    * "mild regression" the old ≤-uniform bound accepted — flips the
    * gate err non-null. */
  val PerplexityBand: Double = 0.92

  /** [[run]] with the training-quality tripwire inline
    * ([[TopicModel.assertQuality]] on the scoring corpus): LDA has no SQL
    * twin, so the driver's check on this pipeline is rows-only — the
    * perplexity bound turns a silent training regression into a non-null
    * gate err. */
  def runChecked(proxy: DataFrame, threshold: Double = 1.0, topK: Int = -1,
                 popularDomains: Set[String] = Set.empty,
                 topicCount: Int = 20, seed: Long = 42L,
                 feedback: Option[DataFrame] = None,
                 maxRatio: Double = PerplexityBand,
                 tiebreak: Seq[Column] = Nil): DataFrame = {
    val model = train(proxy, popularDomains, topicCount, seed = seed,
      feedback = feedback)
    TopicModel.assertQuality(model.topics,
      Corpus.wordCounts(
        featurizeWithLookup(withFeatures(validRows(proxy)),
          model.cuts, model.popular),
        col("clientip"), col("word")),
      maxRatio, label = "proxy LDA")
    Scoring.suspicious(score(proxy, model), threshold, topK, tiebreak)
  }
}
