package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class CheckpointScopeSpec extends SparkSpec {

  import spark.implicits._

  "CheckpointScope.withScope" should
    "return persistent-RDD storage to baseline after a checkpointing operator" in {
    val docs = (0L until 50L)
      .map(i => (i, s"alpha beta gamma delta tokens $i and more tokens ${i % 7}"))
      .toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    CheckpointScope.withScope(spark) {
      // simHashNearDupPairs localCheckpoints its fingerprint frame
      Dedup.simHashNearDupPairs(docs, col("doc_id"), col("text")).count()
      // the operator really did register blocks inside the scope...
      spark.sparkContext.getPersistentRDDs.keySet.size should be > before.size
    }
    // ...and the scope released every one of them
    spark.sparkContext.getPersistentRDDs.keySet shouldBe before
  }

  it should "leave blocks persisted BEFORE the scope untouched and usable" in {
    val outer = spark.range(10).toDF("id").localCheckpoint()
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    CheckpointScope.withScope(spark) {
      spark.range(5).toDF("x").localCheckpoint().count()
    }
    spark.sparkContext.getPersistentRDDs.keySet shouldBe baseline
    outer.count() shouldBe 10 // still computable after the sweep
    outer.unpersist()
  }

  it should "release blocks even when the body throws" in {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    an[IllegalStateException] should be thrownBy {
      CheckpointScope.withScope(spark) {
        spark.range(5).toDF("x").localCheckpoint().count()
        throw new IllegalStateException("boom")
      }
    }
    spark.sparkContext.getPersistentRDDs.keySet shouldBe before
  }
}
