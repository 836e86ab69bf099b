package graft

import graft.operators.Unigram
import graft.operators.Unigram.Piece
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {

  import spark.implicits._

  "Unigram.viterbiSegment" should "pick the max-likelihood segmentation" in {
    // "abc": pieces a(-1), b(-1), c(-1), ab(-1.5), bc(-1.5), abc(-5)
    // best: ab+c or a+bc at -2.5 (vs a+b+c at -3, abc at -5)
    val v = Map("a" -> -1000000L, "b" -> -1000000L, "c" -> -1000000L,
      "ab" -> -1500000L, "bc" -> -1500000L, "abc" -> -5000000L)
    val (pieces, s) = Unigram.viterbiSegment("abc", v, maxPieceLen = 4)
    s shouldBe -2500000L
    pieces.length shouldBe 2
  }

  it should "break score ties toward fewer pieces" in {
    // "ab" via ab(-2.0) or a(-1)+b(-1): same score, prefer 1 piece
    val v = Map("a" -> -1000000L, "b" -> -1000000L, "ab" -> -2000000L)
    val (pieces, s) = Unigram.viterbiSegment("ab", v, maxPieceLen = 4)
    s shouldBe -2000000L
    pieces shouldBe List("ab")
  }

  it should "fall back to the unknown-char penalty for uncovered chars" in {
    val v = Map("a" -> -1000000L)
    val (pieces, s) = Unigram.viterbiSegment("ax", v, maxPieceLen = 4,
      lpUnk = -7000000L)
    pieces shouldBe List("a", "x")
    s shouldBe -8000000L
  }

  "Unigram.buildVocab" should "count weighted substrings and keep chars + top multis" in {
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("id", "txt")
    // words: aa ×2, ab ×1 → substrings: a ×5 (two per aa + one in ab),
    // b ×1, aa ×2, ab ×1
    val v = Unigram.buildVocab(docs, col("txt"), topMulti = 1, maxPieceLen = 2)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    v.keySet shouldBe Set("a", "b", "aa") // top-1 multi: aa (cnt 2) beats ab
    v("a")._1 shouldBe 5L
    v("b")._1 shouldBe 1L
    v("aa")._1 shouldBe 2L
    val total = 5L + 1L + 2L
    v("aa")._2 shouldBe
      math.floor(math.log(2.0 / total) * 1000000 + 0.5).toLong
  }

  "Unigram.encode" should "aggregate per-doc word, piece, and NLL totals" in {
    val vocab = Array(Piece("a", 4, -1000000L), Piece("b", 2, -2000000L),
      Piece("ab", 2, -1500000L))
    val docs = Seq((1L, "ab a"), (2L, "b")).toDF("id", "txt")
    val got = Unigram.encode(docs, col("id"), col("txt"), vocab)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1: "ab" → [ab] (−1.5 beats a+b = −3), "a" → [a] (−1)
    got(1L) shouldBe ((1L, 2L, 2L, 2500000L))
    got(2L) shouldBe ((2L, 1L, 1L, 2000000L))
  }

  it should "drop words beyond maxWordLen on the gate contract" in {
    val vocab = Array(Piece("a", 1, -1000000L))
    val docs = Seq((1L, "aaa aaaaa")).toDF("id", "txt")
    val got = Unigram.encode(docs, col("id"), col("txt"), vocab,
        maxPieceLen = 4, maxWordLen = 3)
      .as[(Long, Long, Long, Long)].head()
    got shouldBe ((1L, 1L, 3L, 3000000L))
  }

  "Unigram.trainViterbiEm" should
      "not increase corpus Viterbi NLL round over round and stay deterministic" in {
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq("alpha beta", "alphabet", "beta beta gamma",
        "gamma alpha")(i % 4))
    }.toDF("id", "txt")
    val nlls = (0 to 3).map { r =>
      val v = Unigram.trainViterbiEm(docs, col("txt"), topMulti = 8,
        maxPieceLen = 4, rounds = r)
      Unigram.corpusNll(docs, col("id"), col("txt"), v)
    }
    nlls.sliding(2).foreach { case Seq(a, b) => b should be <= a }
    // hard-EM actually moves on this corpus (round 1 is a strict gain)
    nlls(1) should be < nlls(0)
    // determinism: same call twice → identical vocab
    val v1 = Unigram.trainViterbiEm(docs, col("txt"), 8, 4, rounds = 2)
    val v2 = Unigram.trainViterbiEm(docs, col("txt"), 8, 4, rounds = 2)
    v1.toSeq shouldBe v2.toSeq
  }
}
