package graft

import org.apache.spark.sql.functions._

/** Bucketed tables co-locate join keys at write time: a join on the bucket
  * key plans with NO shuffle exchange on either side — the write-once,
  * join-many pattern for 100 TB fact tables. */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  "a join on co-bucketed tables" should "plan without shuffle exchanges" in {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1 to 1000).map(i => (i.toLong, s"left$i")).toDF("k", "lv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bkt_left")
      (1 to 1000).map(i => (i.toLong, s"right$i")).toDF("k", "rv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bkt_right")

      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      joined.count() shouldBe 1000

      val plan = joined.queryExecution.executedPlan.toString
      plan should include ("SortMergeJoin")
      plan should not include ("Exchange hashpartitioning")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
