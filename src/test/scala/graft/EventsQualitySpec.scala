package graft

import graft.pipelines.EventsPipeline
import org.apache.spark.sql.functions._

/** The quality tripwire for the driver's rows-only LDA gate
  * (`pipe_events_suspicious` → [[EventsPipeline.runChecked]]): LDA has no
  * SQL twin, so without this the gate passes on row count alone. */
class EventsQualitySpec extends SparkSpec {

  import spark.implicits._

  private lazy val events =
    Tables.load(spark, "/root/testdata/sf0.001", "events")

  "EventsPipeline.assertQuality" should
    "accept the genuinely trained model (perplexity <= uniform baseline)" in {
    val model = EventsPipeline.train(events, topicCount = 10)
    val wc = graft.operators.Corpus.wordCounts(
      EventsPipeline.featurize(events, model.cuts),
      col("user_id"), col("word"))
    val vocab = wc.select("word").distinct().count().toDouble
    val pp = graft.ml.TopicModel.perplexity(model.topics, wc)
    info(f"trained perplexity = $pp%.4f, uniform baseline = $vocab%.0f, " +
      f"ratio = ${pp / vocab}%.4f")
    noException should be thrownBy
      EventsPipeline.assertQuality(model, events)
  }

  it should "throw on an injected quality regression (the driver gate's err path)" in {
    val model = EventsPipeline.train(events, topicCount = 10)
    // the injected regression: topic_prob mass concentrated on ONE word —
    // every other word's P(word|doc) collapses toward the 1e-300 floor and
    // perplexity explodes past the uniform baseline
    val badProbs = model.topics.wordTopicProb
      .withColumn("topic_prob",
        transform(col("topic_prob"), _ =>
          when(col("word") === "purchase_0_0", lit(1.0)).otherwise(lit(1e-12))))
    val bad = model.copy(topics = model.topics.copy(wordTopicProb = badProbs))
    val e = the[IllegalStateException] thrownBy
      EventsPipeline.assertQuality(bad, events)
    e.getMessage should include("LDA training-quality regression")
  }

  "SparkEntry.entry" should "produce rows (the driver's smoke check)" in {
    SparkEntry.entry(spark).count() should be > 0L
  }

  // The SHARED tripwire now wired into every full-LDA gate
  // (pipe_flow_full / pipe_dns_full / pipe_proxy_full via each pipeline's
  // runChecked): hand-built models make the bound's two sides exact —
  // uniform perplexity == |vocab| (allowed at maxRatio 1.0), degenerate
  // mass > |vocab| (throws → the driver gate's err goes non-null).
  "TopicModel.assertQuality" should
    "accept a uniform model and reject a degenerate one on the same corpus" in {
    val wc = Seq(("d1", "a", 3L), ("d1", "b", 1L), ("d2", "b", 2L))
      .toDF("doc", "word", "count")
    val mixes = Seq(("d1", Seq(0.5, 0.5)), ("d2", Seq(0.5, 0.5)))
      .toDF("doc", "topic_mix")
    val uniform = graft.ml.TopicModel.Model(mixes,
      Seq(("a", Seq(0.5, 0.5)), ("b", Seq(0.5, 0.5))).toDF("word", "topic_prob"), 2)
    // P(word|doc) = 0.5 everywhere = 1/|vocab| → perplexity exactly 2.0
    noException should be thrownBy
      graft.ml.TopicModel.assertQuality(uniform, wc, label = "flow LDA")
    // all probability mass on "a": docs that emit "b" collapse to ~0 and
    // perplexity blows past the uniform baseline
    val degenerate = uniform.copy(wordTopicProb =
      Seq(("a", Seq(1.0, 1.0)), ("b", Seq(1e-12, 1e-12))).toDF("word", "topic_prob"))
    val e = the[IllegalStateException] thrownBy
      graft.ml.TopicModel.assertQuality(degenerate, wc, label = "flow LDA")
    e.getMessage should include("flow LDA training-quality regression")
  }
}
