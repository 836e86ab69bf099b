package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, StringReplace}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Byte-pair encoding — TRUE iterative subword training and encoding
  * (Sennrich, Haddow & Birch 2016 §3.2: start from characters, repeatedly
  * merge the corpus-wide most frequent adjacent symbol pair), the
  * token-counting backbone of every LLM data pipeline (mixture budgets,
  * packing, per-source token accounting all count SUBWORD tokens, not
  * whitespace words).
  *
  * Spark-native shape: training runs on the word-FREQUENCY table — one
  * corpus-wide `tokens → groupBy word` shuffle, after which every round
  * touches only the bounded distinct-word frame (the classic trainer's
  * own trick; corpus size never re-enters). Each round is two small jobs:
  * a pair-count aggregation and a one-row argmax collect (same
  * bounded-driver-scalar pattern as the k-means/quantile loops), then a
  * codegen'd literal replace over the sequences. Encoding applies the
  * ranked merges to the DISTINCT words once and joins docs back — never
  * re-encodes repeated words.
  *
  * Determinism: pair counts are exact integers; the argmax tie-breaks
  * (count desc, left asc, right asc) — a total order, so any engine
  * replays the identical merge list.
  *
  * THE REPRESENTATION (what makes one `replace` pass == one BPE merge
  * round): a word's symbol sequence is stored as
  * `"␣␣s1␣␣s2␣␣...␣␣sn␣␣"` — DOUBLE spaces as gaps and edges. Merging
  * pair (l, r) is then the literal replacement `"␣l␣␣r␣" → "␣lr␣"`:
  * each match consumes ONE space from each neighboring gap and the
  * replacement restores it, so back-to-back occurrences (`a b a b`)
  * all merge in a single left-to-right pass — with single-space gaps
  * the consumed boundary space would hide every second occurrence —
  * while the surviving space on each side still anchors l and r as
  * COMPLETE symbols (no prefix/suffix false matches). Literal
  * `StringReplace` (Catalyst codegen) and DuckDB `replace()` share
  * exactly these left-to-right non-overlapping semantics, which is also
  * exactly Sennrich's per-round greedy merge order.
  *
  * At 100 TB: the word-frequency table is the only corpus-scale object
  * (one shuffle, then reused); training rounds are bounded jobs whose
  * count is `numMerges / batch`, not `numMerges` — each round merges up
  * to `batch` PAIRWISE-DISJOINT top pairs at once (see [[trainMerges]]
  * for why the result is provably identical to one-at-a-time training),
  * so a production-size merge count (~32k) is ~500 rounds, not ~32k
  * sequential driver round-trips. The trained vocabulary defaults to a
  * `maxVocab` = 2^17 frequency cut (the standard practice): the frame
  * each round scans stays a few hundred thousand rows regardless of
  * corpus size, instead of the corpus's full distinct-word set. */
object Bpe {

  /** Default vocabulary cap for training: 2^17 words bounds every round's
    * pair-count frame at any corpus size. Pass maxVocab = 0 to disable
    * (discretized/known-small vocabularies only). */
  val DefaultMaxVocab: Int = 1 << 17

  /** Literal (non-regex) replace-all via Catalyst's native StringReplace:
    * codegen'd, and byte-for-byte the semantics of DuckDB's replace(). */
  private def litReplace(c: Column, search: String, repl: String): Column =
    ColumnBridge.column(StringReplace(ColumnBridge.expression(c),
      Literal(search), Literal(repl)))

  /** The double-spaced symbol representation of a word (see object doc). */
  private def spaced(word: Column): Column =
    concat(lit("  "), array_join(split(word, ""), "  "), lit("  "))

  private def symbols(seq: Column): Column =
    filter(split(seq, "\\s+"), t => length(t) > 0)

  /** Adjacent symbol pairs of every sequence, weighted by word count. */
  private def pairCounts(seqs: DataFrame): DataFrame = {
    val tk = symbols(col("seq"))
    seqs.select(col("cnt"), explode(when(size(tk) >= 2,
        zip_with(slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1),
          (a, b) => struct(a.as("l"), b.as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").as("n"))
  }

  /** The distinct-word frequency frame of a corpus (optionally cut to the
    * `maxVocab` most frequent words — ties broken by word — the standard
    * cap that bounds every training round at any corpus size). */
  def wordFreq(docs: DataFrame, text: Column, maxVocab: Int = 0): DataFrame = {
    val words = docs.select(explode(graft.functions.TextFunctions.tokens(text))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    if (maxVocab > 0) words.orderBy(desc("cnt"), asc("word")).limit(maxVocab)
    else words
  }

  /** Train `numMerges` BPE merges; returns them ranked (driver-side list —
    * the merge table is the MODEL, bounded by numMerges, and the encode
    * step needs it as literals anyway). Stops early if the corpus runs
    * out of adjacent pairs.
    *
    * BATCHED ROUNDS, SEQUENTIAL RESULT: each round collects the top
    * `4·batch + 1` pairs (bounded driver rows), greedily keeps a ranked
    * prefix-selection of pairwise-SYMBOL-DISJOINT pairs, and merges them
    * all in one codegen'd replace pass. The kept set is provably the next
    * |kept| merges one-at-a-time training would pick:
    *   - merging (l, r) only changes counts of pairs that SHARE l or r
    *     (destroyed neighbors) and creates pairs involving the new symbol
    *     lr, each with count ≤ some existing pair containing l or r — so
    *     disjoint pairs' counts are untouched by each other's merges;
    *   - every kept pair (beyond the round's argmax, which is always
    *     correct) must out-count every pair it could interact with, so
    *     kept pairs are filtered to count > max(count of any scanned
    *     conflicting/rejected candidate, count at the collection
    *     boundary) — any unseen conflicting pair sits below the boundary,
    *     hence below every kept pair, hence so do all created pairs;
    *   - ties therefore always degrade toward SMALLER batches (worst
    *     case: 1 = plain sequential), never toward a different merge
    *     list, and the (count desc, l, r) total order makes replay
    *     deterministic on any engine.
    * Rounds ≈ numMerges / batch: ~32k production merges become ~500
    * bounded jobs instead of ~32k. */
  def trainMerges(docs: DataFrame, text: Column, numMerges: Int,
                  maxVocab: Int = DefaultMaxVocab,
                  batch: Int = 64): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(batch >= 1, s"batch must be >= 1, got $batch")
    var seqs = wordFreq(docs, text, maxVocab)
      .select(col("cnt"), spaced(col("word")).as("seq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    var rounds = 0
    while (merges.length < numMerges && !exhausted) {
      val want = math.min(batch, numMerges - merges.length)
      val k = want * 4
      val top = pairCounts(seqs)
        .orderBy(desc("n"), asc("l"), asc("r")).limit(k + 1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val cands = top.take(k)
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        // candidates beyond the collected window all count <= boundary
        val boundary =
          if (top.length <= k) Long.MinValue else top(k).getLong(2)
        // greedy ranked scan: keep disjoint pairs, track the highest
        // count among everything NOT kept (conflicts and cap overflow —
        // the floor every kept pair must strictly beat)
        val used = scala.collection.mutable.Set.empty[String]
        val provisional =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var floor = boundary
        cands.foreach { case (l, r, n) =>
          if (provisional.length < want && !used(l) && !used(r)) {
            provisional += ((l, r, n)); used += l; used += r
          } else floor = math.max(floor, n)
        }
        // the round's argmax is always a correct next merge (rank-first
        // tiebreak); later picks survive only above the interaction floor
        val accepted = provisional.head +:
          provisional.tail.filter(_._3 > floor)
        accepted.foreach { case (l, r, _) => merges += ((l, r)) }
        rounds += 1
        System.err.println(s"[bpe] round $rounds: merged ${accepted.length} " +
          s"disjoint pairs (${merges.length}/$numMerges total)")
        val old = seqs
        seqs = seqs.select(col("cnt"),
          accepted.foldLeft(col("seq")) { case (c, (l, r, _)) =>
            litReplace(c, s" $l  $r ", s" $l$r ") }.as("seq"))
          .localCheckpoint()
        old.unpersist()
      }
    }
    seqs.unpersist()
    merges.toSeq
  }

  /** The ranked merge table as a frame: (rank, l, r). */
  def mergesDf(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r) }
      .toDF("rank", "l", "r")
  }

  /** Encode a corpus with a trained merge list: per-doc whitespace word
    * count and BPE subword token count. The merges apply to the DISTINCT
    * words once (a chain of `numMerges` codegen'd literal replaces in
    * rank order — applying ranks in order over whole sequences is
    * equivalent to Sennrich's per-word priority loop because a later
    * merge's parts can only be produced by earlier-ranked merges); docs
    * join their words back against that bounded encoded vocabulary.
    * Output: (doc_id, n_words, n_bpe_tokens). */
  def encode(docs: DataFrame, id: Column, text: Column,
             merges: Seq[(String, String)]): DataFrame = {
    val vocabSeq = merges.foldLeft(spaced(col("word"))) {
      case (c, (l, r)) => litReplace(c, s" $l  $r ", s" $l$r ")
    }
    val vocab = docs
      .select(explode(graft.functions.TextFunctions.tokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"),
        size(symbols(vocabSeq)).cast("long").as("n_tok"))
    val words = docs.select(id.cast("long").as("doc_id"),
      explode(graft.functions.TextFunctions.tokens(text)).as("word"))
    words.join(vocab, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_tok").as("n_bpe_tokens"))
  }
}
