package graft

import graft.operators.Scoring
import graft.queries.FixedModelQueries
import org.apache.spark.sql.functions._

/** The checked-in legacy-model fixture behind the pipe_*_fixedmodel gates:
  * import shape, the uniform-default path, and the all-zero gamma doc.
  * (The gates themselves hash-check the full scoring dataflow vs DuckDB.)
  */
class FixedModelSpec extends SparkSpec {
  import spark.implicits._

  "the legacy model fixture" should "import with the expected shape" in {
    val m = FixedModelQueries.fixtureModel(spark)
    m.topicCount shouldBe 3
    m.docTopicMix.count() shouldBe 95L
    m.wordTopicProb.count() shouldBe 26L
    // every mix is normalized (sums to ~1) except the all-zero doc
    val sums = m.docTopicMix
      .select(col("doc"), aggregate(col("topic_mix"), lit(0.0), _ + _).as("s"))
      .as[(String, Double)].collect().toMap
    sums("10.1.24.9") shouldBe 0.0
    (sums - "10.1.24.9").values.foreach(_ shouldBe 1.0 +- 1e-12)
  }

  it should "score unknown docs and words with the uniform default" in {
    val m = FixedModelQueries.fixtureModel(spark)
    val events = Seq(
      ("no-such-doc", "no-such-word"),   // both defaults
      ("10.1.24.9", "no-such-word"))     // zero-vector mix beats the default
      .toDF("d", "w")
    val got = Scoring.score(events, col("d"), col("w"), m)
      .select(col("d"), col("score")).as[(String, Double)].collect().toMap
    val u = 1.0 / 3
    got("no-such-doc") shouldBe (((0.0 + u * u) + u * u) + u * u)
    got("10.1.24.9") shouldBe 0.0 // zero mix: parsed, joined, dot = 0
  }
}
