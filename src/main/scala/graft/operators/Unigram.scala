package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Unigram language-model tokenizer (Kudo 2018, "Subword Regularization";
  * the SentencePiece unigram model) — the BPE complement: instead of
  * greedy merge rules, a piece VOCABULARY with log-probabilities and
  * per-word Viterbi segmentation maximizing the piece-likelihood sum.
  *
  * Everything is engine-stable: piece probabilities are relative
  * frequencies fixed-pointed to integer micro log-probs (one ln per
  * piece, 6-dp-rounded — the repo's IEEE-parity contract), and the
  * Viterbi objective maximizes (Σ lp_micro, then fewest pieces) — a
  * total order a SQL twin replays via k = 64·s − np packing (valid for
  * words under 64 pieces).
  *
  * Scale shape: vocabulary CONSTRUCTION is one substring-explode hash
  * aggregation (map-side combined; substring count per word is
  * ≤ maxPieceLen·|word|) plus a TakeOrdered top-k — the vocab object is
  * bounded by construction (chars + topMulti) and rides a closure, never
  * a join. ENCODING is map-only: the per-token Viterbi DP (≤ 4·|word|
  * table cells) runs inside one pass, followed by a single per-doc
  * aggregation — no distinct-word join, nothing grows with the corpus
  * but the scan. Training iterates segment→count→re-estimate with the
  * count step the same bounded aggregation.
  */
object Unigram {

  /** A piece vocabulary entry: surface form, training count, integer
    * micro log-probability ⌊ln(cnt/total)·10⁶ + 0.5⌋. */
  final case class Piece(piece: String, cnt: Long, lpMicro: Long)

  /** Weighted substring counts over the corpus word-frequency table:
    * every contiguous substring of length 1..maxPieceLen of every word,
    * counted once per occurrence position, weighted by word count. */
  def substringCounts(docs: DataFrame, text: Column,
                      maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
    val wc = docs.select(explode(TextFunctions.tokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val w = col("word")
    val subs = flatten(transform(sequence(lit(1), length(w)), s =>
      transform(sequence(lit(1), least(lit(maxPieceLen), length(w) - s + 1)),
        l => w.substr(s, l))))
    wc.select(col("cnt"), explode(subs).as("piece"))
      .groupBy("piece").agg(sum("cnt").as("cnt"))
  }

  /** Seed vocabulary: ALL single characters (coverage guarantee — every
    * word stays segmentable) plus the `topMulti` most frequent
    * multi-character substrings (count desc, piece asc tiebreak);
    * probabilities are relative frequencies over the SELECTED pieces.
    * Returns the bounded (piece, cnt, lp_micro) frame. */
  def buildVocab(docs: DataFrame, text: Column, topMulti: Int = 20,
                 maxPieceLen: Int = 4): DataFrame = {
    require(topMulti >= 0, "topMulti must be >= 0")
    val sc = substringCounts(docs, text, maxPieceLen)
    val chars = sc.where(length(col("piece")) === 1)
    val multis = sc.where(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(topMulti)
    val vc = chars.unionByName(multis)
    val total = vc.agg(sum("cnt")).head().getLong(0)
    vc.withColumn("lp_micro",
      floor(log(col("cnt").cast("double") / total.toDouble) * 1000000 + 0.5)
        .cast("long"))
  }

  /** Collect a vocab frame to the bounded driver object (loud cap —
    * vocabularies are model-sized by contract). */
  def collectVocab(vocab: DataFrame, maxPieces: Int = 1 << 20): Array[Piece] = {
    val rows = graft.Lineage.cutSmall(
      vocab.select("piece", "cnt", "lp_micro"), maxPieces).collect()
    rows.map(r => Piece(r.getString(0), r.getLong(1), r.getLong(2)))
  }

  /** Viterbi segmentation of one word: maximize Σ lp over pieces, ties
    * to the FEWEST pieces (then any path — tied (score, count) paths
    * emit identical outputs). Returns (pieces, sMicro). A character
    * absent from the vocab consumes `lpUnk` (never reachable when the
    * vocab was built from the same corpus). */
  private[graft] def viterbiSegment(word: String,
                                        vocab: Map[String, Long],
                                        maxPieceLen: Int,
                                        lpUnk: Long = -20723266L):
      (List[String], Long) = {
    val n = word.length
    // dp as (score, pieceCount, backPieceLen); score maximized, count
    // minimized — compared lexicographically
    val s = Array.fill(n + 1)(Long.MinValue)
    val np = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(0)
    s(0) = 0L; np(0) = 0
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        if (s(i - l) != Long.MinValue) {
          val lp = if (l == 1)
            vocab.getOrElse(word.substring(i - 1, i), lpUnk)
          else vocab.getOrElse(word.substring(i - l, i), Long.MinValue)
          if (lp != Long.MinValue) {
            val cs = s(i - l) + lp
            val cn = np(i - l) + 1
            if (cs > s(i) || (cs == s(i) && cn < np(i))) {
              s(i) = cs; np(i) = cn; back(i) = l
            }
          }
        }
        l += 1
      }
      i += 1
    }
    var pieces = List.empty[String]
    var p = n
    while (p > 0) {
      val l = back(p)
      pieces = word.substring(p - l, p) :: pieces
      p -= l
    }
    (pieces, s(n))
  }

  /** Map-only corpus encoding with a FIXED vocabulary: per document the
    * whitespace word count, total Viterbi piece count, and total
    * negative log-likelihood in micro-units (integer-exact, so the sums
    * are partition-order-free). Words longer than `maxWordLen` are
    * dropped on both sides of the oracle contract (the np < 64 packing
    * bound); pass Int.MaxValue to keep everything. */
  def encode(docs: DataFrame, id: Column, text: Column,
             vocab: Array[Piece], maxPieceLen: Int = 4,
             maxWordLen: Int = Int.MaxValue): DataFrame = {
    val vmap = vocab.map(p => p.piece -> p.lpMicro).toMap
    val seg = udf((w: String) => {
      val (pieces, sm) = viterbiSegment(w, vmap, maxPieceLen)
      (pieces.length, -sm)
    })
    docs.select(id.cast("long").as("doc_id"),
        explode(TextFunctions.tokens(text)).as("word"))
      .where(length(col("word")) <= maxWordLen)
      .select(col("doc_id"), seg(col("word")).as("seg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("seg._1")).cast("long").as("n_pieces"),
        sum(col("seg._2")).as("nll_micro"))
  }

  /** Viterbi-EM ("hard-EM") training: `rounds` iterations of segment →
    * piece-usage counts → relative-frequency re-estimate. NO smoothing
    * and NO floor: the M-step is the exact maximizer of the Viterbi-path
    * likelihood, so the corpus Viterbi NLL is non-increasing round over
    * round (the k-means argument); unused pieces drop out (their count
    * is zero), and coverage survives because every word's previous
    * segmentation keeps its own pieces alive. Returns the final vocab.
    *
    * Scale shape per round: one map-only segmentation pass emitting
    * pieces, one bounded hash aggregation (≤ |vocab| rows). */
  def trainViterbiEm(docs: DataFrame, text: Column, topMulti: Int = 20,
                     maxPieceLen: Int = 4, rounds: Int = 2): Array[Piece] = {
    require(rounds >= 0, "rounds must be >= 0")
    var vocab = collectVocab(buildVocab(docs, text, topMulti, maxPieceLen))
    val words = docs.select(explode(TextFunctions.tokens(text)).as("word"))
    for (_ <- 1 to rounds) {
      val vmap = vocab.map(p => p.piece -> p.lpMicro).toMap
      val pieceUdf = udf((w: String) =>
        viterbiSegment(w, vmap, maxPieceLen)._1)
      val counts = graft.Lineage.cutSmall(
        words.select(explode(pieceUdf(col("word"))).as("piece"))
          .groupBy("piece").agg(count(lit(1)).as("cnt"))).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val total = counts.map(_._2).sum
      vocab = counts.sortBy(_._1).map { case (p, c) =>
        Piece(p, c,
          math.floor(math.log(c.toDouble / total) * 1000000 + 0.5).toLong)
      }
    }
    vocab
  }

  /** Total corpus Viterbi NLL (micro-units) under a vocab — the
    * training-quality metric the EM spec asserts non-increasing. */
  def corpusNll(docs: DataFrame, id: Column, text: Column,
                vocab: Array[Piece], maxPieceLen: Int = 4): Long =
    encode(docs, id, text, vocab, maxPieceLen)
      .agg(sum("nll_micro")).head().getLong(0)
}
