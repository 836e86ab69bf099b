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
}
