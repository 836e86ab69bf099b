package graft

import graft.pipelines.{DnsPipeline, FlowPipeline, ProxyPipeline}
import graft.sources.{Feedback, Sinks}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** End-to-end runs of the three suspicious-connects pipelines on small
  * synthetic frames, plus the feedback TSV source and TSV sink. */
class PipelinesSpec extends SparkSpec {

  import spark.implicits._

  private val rng = new scala.util.Random(42)

  "FlowPipeline" should "train and score netflow-shaped events end-to-end" in {
    val flows = (0 until 400).map { i =>
      (f"2016-05-05 12:00:00", 12, i % 60, i % 60,
        s"10.0.0.${i % 20}", s"172.16.0.${i % 15}",
        if (i % 3 == 0) 80 else 1024 + rng.nextInt(40000),
        if (i % 5 == 0) 0 else rng.nextInt(60000),
        (rng.nextInt(100) + 1).toLong, (rng.nextInt(100000) + 40).toLong)
    }.toDF("treceived", "trhour", "trminute", "trsec",
      "sip", "dip", "dport", "sport", "ipkt", "ibyt")
    val out = FlowPipeline.run(flows, threshold = 1.0, topK = 25, topicCount = 4)
    val scores = out.select("score").as[Double].collect()
    scores.length shouldBe 25
    scores.foreach(s => s should (be >= 0.0 and be <= 1.0))
    scores.toSeq shouldBe scores.sorted.toSeq
    out.columns should contain allOf ("src_word", "dst_word", "ip_pair")
  }

  it should "reject rows outside valid time ranges" in {
    val flows = Seq(
      ("x", 12, 30, 30, "a", "b", 80, 2000, 1L, 10L),
      ("x", 25, 30, 30, "a", "b", 80, 2000, 1L, 10L), // bad hour
      ("x", 12, 61, 30, "a", "b", 80, 2000, 1L, 10L)  // bad minute
    ).toDF("treceived", "trhour", "trminute", "trsec",
      "sip", "dip", "dport", "sport", "ipkt", "ibyt")
    FlowPipeline.validTimes(flows).count() shouldBe 1
  }

  "DnsPipeline" should "train and score dns-shaped events end-to-end" in {
    val hosts = Seq("services.amazon.com", "a.b.evil.net", "x.y.z.bad.com.mx",
      "9.8.7.6.in-addr.arpa", "short.com")
    val dns = (0 until 300).map { i =>
      (s"t$i", (1000000L + i * 37) % 86400, 40 + i % 500,
        s"10.0.0.${i % 25}", hosts(i % hosts.length), i % 4, i % 3)
    }.toDF("frame_time", "unix_tstamp", "frame_len", "ip_dst",
      "dns_qry_name", "dns_qry_type", "dns_qry_rcode")
    val out = DnsPipeline.run(dns, threshold = 1.0, topK = 20,
      popularDomains = Set("amazon"), topicCount = 4)
    val scores = out.select("score").as[Double].collect()
    scores.length shouldBe 20
    scores.toSeq shouldBe scores.sorted.toSeq
  }

  "ProxyPipeline" should "train and score proxy-shaped events end-to-end" in {
    val proxy = (0 until 300).map { i =>
      ("2016-05-05", f"${i % 24}%02d:${i % 60}%02d:00", s"10.0.0.${i % 25}",
        s"host${i % 9}.com", if (i % 2 == 0) "GET" else "POST",
        s"agent${i % 3}", "text/plain", s"/p/${rng.nextString(0)}uri$i", s"${200 + (i % 3) * 100}")
    }.toDF("p_date", "p_time", "clientip", "host", "reqmethod",
      "useragent", "resconttype", "fulluri", "respcode")
    val out = ProxyPipeline.run(proxy, threshold = 1.0, topK = 20, topicCount = 4)
    val scores = out.select("score").as[Double].collect()
    scores.length shouldBe 20
    scores.toSeq shouldBe scores.sorted.toSeq
  }

  "DnsPipeline.featurizeWithLookup" should "class domains identically to the Set variant via broadcast join" in {
    val hosts = Seq("a.amazon.com", "x.evil.net", "www.intel.com", "plain.com")
    val dns = hosts.zipWithIndex.map { case (h, i) =>
      (s"t$i", 100L + i, 40 + i, s"10.0.0.$i", h, i % 4, i % 3)
    }.toDF("frame_time", "unix_tstamp", "frame_len", "ip_dst",
      "dns_qry_name", "dns_qry_type", "dns_qry_rcode")
    val withSub = DnsPipeline.withSubdomains(dns)
    val cuts = DnsPipeline.computeCuts(withSub)
    val popularSet = Set("amazon", "evil")
    val popularDF = popularSet.toSeq.toDF("domain")
    val a = DnsPipeline.featurize(withSub, cuts, popularSet)
      .select("ip_dst", "word").as[(String, String)].collect().sorted.toSeq
    val b = DnsPipeline.featurizeWithLookup(withSub, cuts, popularDF)
      .select("ip_dst", "word").as[(String, String)].collect().sorted.toSeq
    b shouldBe a
    // all three classes fire: intel safe list (2), popular (1), other (0)
    a.map(_._2.split("_")(0)).toSet shouldBe Set("0", "1", "2")
  }

  "Feedback.load" should "read severity-filtered TSV with weight" in {
    val dir = Files.createTempDirectory("fb").toFile
    val f = new java.io.File(dir, "scores.tsv")
    val w = new java.io.PrintWriter(f)
    w.println("sev\tip\tscore")
    w.println("3\t10.0.0.1\t0.001")
    w.println("2\t10.0.0.2\t0.5")
    w.println("3\t10.0.0.3\t0.002")
    w.close()
    val schema = StructType(Seq(StructField("sev", IntegerType),
      StructField("ip", StringType), StructField("score", StringType)))
    val got = Feedback.load(spark, f.getAbsolutePath, schema, "sev",
      duplicationFactor = 500)
    got.count() shouldBe 2
    got.select("weight").distinct().as[Long].collect() shouldBe Array(500L)
  }

  it should "return an empty frame for a missing file" in {
    val schema = StructType(Seq(StructField("sev", IntegerType)))
    Feedback.load(spark, "/nonexistent/path.tsv", schema, "sev").count() shouldBe 0
  }

  "Sinks.writeTsv" should "write tab-separated results" in {
    val dir = Files.createTempDirectory("sink").toFile.getAbsolutePath + "/out"
    Sinks.writeTsv(Seq(("a", 1), ("b", 2)).toDF("k", "v"), dir)
    val lines = spark.read.option("sep", "\t").csv(dir)
      .as[(String, String)].collect().toSet
    lines shouldBe Set(("a", "1"), ("b", "2"))
  }

  "Sinks.writeJsonl/readJsonl" should
    "round-trip a corpus under an explicit schema and surface corrupt lines" in {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("jsonl").toFile.getAbsolutePath + "/docs"
    val docs = Seq((1L, "alpha text", "en"), (2L, "beta text", "fr"))
      .toDF("doc_id", "text", "lang")
    Sinks.writeJsonl(docs, dir)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    Sinks.readJsonl(spark, dir, schema)
      .as[(Long, String, String)].collect().toSet shouldBe
      Set((1L, "alpha text", "en"), (2L, "beta text", "fr"))
    // a malformed line must surface in _corrupt_record, not kill the read
    // or silently vanish
    Files.writeString(java.nio.file.Paths.get(dir, "part-bad.json"),
      """{"doc_id": 3, "text": "good", "lang": "en"}
        |{"doc_id": broken json here
        |""".stripMargin)
    // Spark disallows queries touching ONLY _corrupt_record on a raw
    // json scan — materialize first (the documented pattern)
    val withCorrupt =
      Sinks.readJsonl(spark, dir, schema, keepCorrupt = true).cache()
    try {
      withCorrupt.where(col("_corrupt_record").isNotNull).count() shouldBe 1
      withCorrupt.where(col("_corrupt_record").isNull).count() shouldBe 3
    } finally withCorrupt.unpersist()
    // default drops the diagnostic column but keeps parseable rows
    Sinks.readJsonl(spark, dir, schema).count() shouldBe 4 // 3 good + 1 null row
  }

  "Sinks.writeOrc/readOrc" should
    "round-trip typed columns and prune partitions on read" in {
    val dir = Files.createTempDirectory("orc").toFile.getAbsolutePath + "/docs"
    val docs = Seq((1L, "alpha", "en", Seq(0.5, 1.5)),
      (2L, "beta", "fr", Seq(2.0, 3.0)))
      .toDF("doc_id", "text", "lang", "embedding")
    Sinks.writeOrc(docs, dir, partitionCols = Seq("lang"))
    val back = Sinks.readOrc(spark, dir)
    back.select("doc_id", "text", "lang", "embedding")
      .as[(Long, String, String, Seq[Double])].collect().toSet shouldBe
      Set((1L, "alpha", "en", Seq(0.5, 1.5)), (2L, "beta", "fr", Seq(2.0, 3.0)))
    // partition pruning reaches the scan exactly like the parquet path
    val pruned = back.where(col("lang") === "en")
    pruned.queryExecution.executedPlan.collectLeaves().head.toString should
      include ("PartitionFilters: [isnotnull(lang#")
    pruned.select("doc_id", "text", "lang", "embedding")
      .as[(Long, String, String, Seq[Double])].collect()
      .map(_._1).toSeq shouldBe Seq(1L)
  }
}
