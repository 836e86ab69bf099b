package graft

import graft.ml.ModelIO

/** Golden numerics for the legacy model-exchange formats, from the
  * reference's public unit tests (reference: OniLDACWrapperTest.scala:
  * 11-23 beta softmax, 25-51 gamma normalize + zero guard, 53-75 corpus
  * lines, 118-151 beta transpose). */
class ModelIOSpec extends SparkSpec {

  "parseBetaLine" should "exp-normalize a log-probability line" in {
    val r = ModelIO.parseBetaLine("1 2 3 4 5")
    r.length shouldBe 5
    r(0) shouldBe 0.011656230956039607 +- 1e-15
    r(1) shouldBe 0.03168492079612427 +- 1e-15
    r(2) shouldBe 0.0861285444362687 +- 1e-15
    r(3) shouldBe 0.23412165725273662 +- 1e-15
    r(4) shouldBe 0.6364086465588308 +- 1e-15
  }

  "parseGammaLine" should "normalize by the line sum" in {
    val line = "0.0124531442 0.0124531442 0.0124531442 0.0124531442 0.0124531442 " +
      "0.0124531442 0.0124531442 0.0124531442 0.0124531442 0.0124531442 0.0124531442 " +
      "23983.5532262138 0.0124531442 0.0124531442 0.0124531442 0.0124531442 " +
      "0.0124531442 0.0124531442 22999.4716800747 0.0124531442"
    val r = ModelIO.parseGammaLine(line)
    r(0) shouldBe 2.6505498126219955e-7 +- 1e-18
    r(11) shouldBe 0.5104702996191969 +- 1e-15
    r(18) shouldBe 0.48952492939114034 +- 1e-15
  }

  it should "yield the zero vector when the line sums to zero" in {
    val r = ModelIO.parseGammaLine("0.0 0.0 1.0 -1.0 0.0")
    r shouldBe Array(0.0, 0.0, 0.0, 0.0, 0.0)
  }

  "corpusLine" should "format sparse doc lines" in {
    ModelIO.corpusLine(Seq(0 -> 8L, 3 -> 5L)) shouldBe "2 0:8 3:5"
    ModelIO.corpusLine(Seq(1 -> 4L)) shouldBe "1 1:4"
  }

  "wordProbsFromBeta" should "normalize per topic then transpose" in {
    val wordIndex = Map("-1_23.0_7.0_7.0_4.0" -> 3, "23.0_7.0_7.0_4.0" -> 0,
      "333333.0_7.0_7.0_4.0" -> 2, "80.0_7.0_7.0_4.0" -> 1)
    val lines = Array(
      "-15.3937807051 -536.5105632673 -532.4503365466 -10.8318318078",
      "-532.7002781469 -447.4890465231 -525.1690620213 -13.9180467610")
    val r = ModelIO.wordProbsFromBeta(lines, wordIndex)
    r.keySet.size shouldBe 4
    r("23.0_7.0_7.0_4.0").length shouldBe 2
    r("23.0_7.0_7.0_4.0")(0) shouldBe 0.010333787125924218 +- 1e-15
    r("-1_23.0_7.0_7.0_4.0")(0) shouldBe 0.9896662128740757 +- 1e-15
  }

  "exportCorpus" should "produce reference-format lines distributedly" in {
    import spark.implicits._
    val wc = Seq(("192.168.1.1", "w_a", 8L), ("10.10.98.123", "w_b", 4L),
      ("66.23.45.11", "w_c", 2L), ("192.168.1.1", "w_d", 5L))
      .toDF("doc", "word", "count")
    val (lines, dict) = ModelIO.exportCorpus(wc)
    val d = dict.as[(String, Int)].collect().toMap
    d shouldBe Map("w_a" -> 0, "w_b" -> 1, "w_c" -> 2, "w_d" -> 3)
    val l = lines.as[(String, String)].collect().toMap
    l("192.168.1.1") shouldBe "2 0:8 3:5"
    l("10.10.98.123") shouldBe "1 1:4"
    l("66.23.45.11") shouldBe "1 2:2"
  }

  "importLegacyModel" should "round-trip into a scorable model" in {
    import graft.operators.Scoring
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val model = ModelIO.importLegacyModel(spark,
      docs = Seq("d1"), gammaLines = Seq("1.0 3.0"),
      betaLines = Seq("0 0", "0 1"), wordIndex = Map("w1" -> 0, "w2" -> 1))
    val events = Seq(("d1", "w1")).toDF("d", "w")
    val got = Scoring.score(events, col("d"), col("w"), model)
      .select("score").as[Double].head()
    // mix = [0.25, 0.75]; w1 probs = [0.5, e^0/(e^0+e^1)=0.26894...]
    got shouldBe (0.25 * 0.5 + 0.75 * (1.0 / (1 + math.E))) +- 1e-12
  }
}
