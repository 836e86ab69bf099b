package graft

import graft.ml.{ModelIO, SuspiciousConnectsEstimator, SuspiciousConnectsModel, TopicModel}
import graft.operators.Scoring
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Train → save → load → score must be bit-identical (parquet persists the
  * exact doubles), and the legacy beta/gamma text writers must round-trip
  * through the reference-format parsers. */
class PersistenceSpec extends SparkSpec {

  import spark.implicits._

  private def corpus() = (0 until 60).map { i =>
    (s"d${i % 7}", s"w${i % 11}", (i % 3 + 1).toLong)
  }.toDF("doc", "word", "count")

  private def scores(m: TopicModel.Model) = {
    val events = (0 until 40).map(i => (s"d${i % 9}", s"w${i % 13}")).toDF("d", "w")
    Scoring.score(events, col("d"), col("w"), m)
      .select("d", "w", "score").as[(String, String, Double)].collect().sorted.toSeq
  }

  "TopicModel.save/load" should "round-trip to bit-identical scores" in {
    val dir = Files.createTempDirectory("tm").toFile.getAbsolutePath
    val m = TopicModel.train(corpus(), topicCount = 4, maxIter = 5)
    TopicModel.save(m, s"$dir/model")
    val loaded = TopicModel.load(spark, s"$dir/model")
    loaded.topicCount shouldBe 4
    scores(loaded) shouldBe scores(m) // exact equality, not approximate
  }

  "SuspiciousConnectsModel" should "persist via MLWritable and reload via MLReadable" in {
    val dir = Files.createTempDirectory("scm").toFile.getAbsolutePath
    val fitted = new SuspiciousConnectsEstimator()
      .setTopicCount(3).setMaxIter(5)
      .setDocCol("d").setWordCol("w")
      .fit(corpus().withColumnRenamed("doc", "d").withColumnRenamed("word", "w"))
    fitted.write.overwrite().save(s"$dir/m")
    val loaded = SuspiciousConnectsModel.load(s"$dir/m")
    loaded.uid shouldBe fitted.uid
    val in = Seq(("d1", "w1"), ("dX", "w2")).toDF("d", "w")
    val a = fitted.transform(in).select("score").as[Double].collect().toSeq
    val b = loaded.transform(in).select("score").as[Double].collect().toSeq
    b shouldBe a
  }

  "FlowPipeline.save/load" should "reload cuts (incl. +Infinity) and score identically" in {
    import graft.pipelines.FlowPipeline
    val dir = Files.createTempDirectory("fpm").toFile.getAbsolutePath
    val rng = new scala.util.Random(1)
    val flows = (0 until 300).map { i =>
      ("t", 12, i % 60, i % 60, s"10.0.0.${i % 20}", s"172.16.0.${i % 15}",
        80, 1024 + rng.nextInt(40000), (rng.nextInt(90) + 1).toLong,
        (rng.nextInt(90000) + 40).toLong)
    }.toDF("treceived", "trhour", "trminute", "trsec",
      "sip", "dip", "dport", "sport", "ipkt", "ibyt")
    val m = FlowPipeline.train(flows, topicCount = 3, maxIter = 5)
    FlowPipeline.save(m, s"$dir/m")
    val loaded = FlowPipeline.load(spark, s"$dir/m")
    loaded.cuts.time.toSeq shouldBe m.cuts.time.toSeq
    loaded.cuts.ibyt.toSeq shouldBe m.cuts.ibyt.toSeq
    loaded.cuts.ipkt.toSeq shouldBe m.cuts.ipkt.toSeq
    val a = FlowPipeline.score(flows, m).select("score").as[Double].collect().sorted.toSeq
    val b = FlowPipeline.score(flows, loaded).select("score").as[Double].collect().sorted.toSeq
    b shouldBe a
    // +Infinity cuts survive parquet (JSON would mangle them)
    import graft.pipelines.DnsPipeline
    val infModel = DnsPipeline.Model(
      DnsPipeline.Cuts(Array(1.0), Array.fill(3)(Double.PositiveInfinity),
        Array(0.5), Array(2.0), Array(3.0)),
      DnsPipeline.popularFrame(spark, Set("amazon")), m.topics, 3)
    DnsPipeline.save(infModel, s"$dir/dns")
    val dnsLoaded = DnsPipeline.load(spark, s"$dir/dns")
    dnsLoaded.cuts.frameLen.toSeq shouldBe Seq.fill(3)(Double.PositiveInfinity)
    dnsLoaded.popularDomains shouldBe Set("amazon")
  }

  "ModelIO beta/gamma writers" should "round-trip through the reference parsers" in {
    val m = TopicModel.train(corpus(), topicCount = 4, maxIter = 5)
    val (betaLines, wordIndex) = ModelIO.exportBetaLines(m)
    // sentinel: one extra trailing column beyond the vocabulary
    betaLines.head.split(" ").length shouldBe (wordIndex.size + 1)
    val gamma = ModelIO.exportGammaLines(m)
      .as[(String, String)].collect().toSeq.sortBy(_._1)
    val docs = gamma.map(_._1)
    val imported = ModelIO.importLegacyModel(spark, docs,
      gamma.map(_._2), betaLines, wordIndex)
    imported.topicCount shouldBe m.topicCount
    val a = scores(m)
    val b = scores(imported)
    a.size shouldBe b.size
    a.zip(b).foreach { case ((d1, w1, s1), (d2, w2, s2)) =>
      (d1, w1) shouldBe ((d2, w2))
      s2 shouldBe s1 +- 1e-12
    }
  }
}
