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
  * (one shuffle, then reused); rounds are sequential bounded jobs, so
  * wall-clock grows with `numMerges`, not data. For production-size
  * merge counts (~32k) cap the trained vocabulary with `maxVocab`
  * (frequency cut, the standard practice) — the frame each round scans
  * stays a few hundred thousand rows regardless of corpus size. */
object Bpe {

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
    * out of adjacent pairs. */
  def trainMerges(docs: DataFrame, text: Column, numMerges: Int,
                  maxVocab: Int = 0): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var seqs = wordFreq(docs, text, maxVocab)
      .select(col("cnt"), spaced(col("word")).as("seq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val top = pairCounts(seqs)
        .orderBy(desc("n"), asc("l"), asc("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top.head.getString(0), top.head.getString(1))
        merges += ((l, r))
        val old = seqs
        seqs = seqs.select(col("cnt"),
          litReplace(col("seq"), s" $l  $r ", s" $l$r ").as("seq"))
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
