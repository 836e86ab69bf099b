package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Bag-of-words corpus construction: per-(doc, word) counts.
  *
  * Reference: the `(ip, word) -> count` reduceByKey builders
  * (netflow/FlowPreLDA.scala:131-139, dns/DNSPreLDA.scala:114-120,
  * proxy/ProxySuspiciousConnectsModel.scala:189-190) and the ×N feedback
  * row duplication (FlowPreLDA.scala:98). Expressed as a weighted hash
  * aggregation: Spark performs map-side partial aggregation automatically,
  * and feedback weighting is a count multiplier instead of physical row
  * explosion — same corpus, none of the shuffle volume.
  */
object Corpus {

  /** (doc, word, count) with an optional per-row weight. */
  def wordCounts(df: DataFrame, doc: Column, word: Column,
                 weight: Column = lit(1L)): DataFrame =
    df.groupBy(doc.cast("string").as("doc"), word.cast("string").as("word"))
      .agg(sum(weight.cast("long")).as("count"))

  /** TF-IDF over a document table: (doc_id, token, tf, df, tfidf) with
    * tfidf = tf · ln(N / df) rounded engine-stably to 6 dp. Two hash
    * aggregations (term counts, then document frequencies — both map-side
    * combined) and one equi join; N is a single count. Raw-count tf keeps
    * every number integral until the one final log/multiply, so the
    * DuckDB twin matches bit-for-bit under the shared rounding rule. */
  def tfidf(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val n = docs.count()
    val toks = docs.select(id.cast("long").as("doc_id"),
      explode(graft.functions.TextFunctions.tokens(text)).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(df, "token")
      .withColumn("tfidf",
        floor((col("tf") * log(lit(n.toDouble) / col("df"))) * 1000000 + 0.5) / 1000000.0)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** Per-document language-model quality score — the perplexity-style
    * quality filter of large-corpus curation (score against an n-gram LM,
    * cut the worst tail; cf. the CCNet / GPT-3 data-pipeline recipe): an
    * add-one-smoothed bigram model TRAINED ON THE CORPUS ITSELF scores
    * each document's average negative log-likelihood (natural log;
    * boilerplate scores low, anomalous/garbled text scores high). Returns
    * (doc_id, n_bigrams, avg_nll) for every doc with >= 2 tokens.
    *
    * Scale shape: bigrams come from one lead() window per doc (one keyed
    * shuffle — documents are bounded, never a global sort); model counts
    * are two map-side-combined hash aggregations; scoring is one equi join
    * back on (w1, w2). Each bigram's NLL is snapped to 1e-6 FIXED POINT
    * before the per-doc aggregation, so the sum is an exact integer —
    * order-independent across partitionings and bit-identical in the
    * DuckDB twin (a raw double sum would vary with reduction order). */
  def bigramLmScores(docs: DataFrame, id: Column, text: Column,
                     smallVocabMax: Long = 131072L,
                     probsBroadcastMaxRows: Long = 524288L): DataFrame = {
    val toks = docs.select(id.cast("long").as("doc_id"),
      posexplode(graft.functions.TextFunctions.tokens(text))
        .as(Seq("pos", "token")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val bg = toks.withColumn("nxt", lead("token", 1).over(w))
      .where(col("nxt").isNotNull)
      .select(col("doc_id"), col("token").as("w1"), col("nxt").as("w2"))
      .localCheckpoint(false) // three consumers: c12, c1, the score join
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = toks.select("token").distinct().count()
    // Join strategy, size-gated on MEASURED row counts: every side of
    // these joins scales with the corpus (the bigram table is O(distinct
    // bigrams), the unigram table O(vocab)) — a planner-chosen broadcast
    // OOMs once the vocabulary grows (observed at the 100x replica: "Not
    // enough memory to build and broadcast"), so corpus-scaled sides pin
    // a MERGE shuffle join on (w1[, w2]), the 100 TB plan. Small corpora
    // keep the fast broadcast plan: `vocab` (already computed) bounds the
    // unigram side exactly, and when it says interactive-scale, one cheap
    // distinct-bigram count over the checkpointed bigrams decides the
    // probs side too. At scale the gate adds NO extra job — the vocab
    // comparison alone routes both joins to merge.
    val bigramRows = if (vocab <= smallVocabMax) c12.count() else Long.MaxValue
    def gated(df: DataFrame, rows: Long, maxRows: Long) =
      if (rows <= maxRows) broadcast(df) else df.hint("merge")
    val probs = c12.join(gated(c1, vocab, smallVocabMax), "w1")
      .withColumn("nll6",
        floor(-log((col("c12") + 1).cast("double")
          / (col("c1") + vocab).cast("double")) * 1000000 + 0.5).cast("long"))
    bg.join(gated(probs, bigramRows, probsBroadcastMaxRows), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("nll6").as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        (floor(col("s").cast("double") / col("n_bigrams") + 0.5) / 1000000.0)
          .as("avg_nll"))
  }

  /** Within-document repetition statistics — the standard repetition-based
    * quality signal for training corpora (heavily repeated tokens mark
    * boilerplate/spam): per doc, total and distinct token counts, the top
    * token's count, and the top-token / distinct-token ratios. Two
    * map-side-combined hash aggregations over narrow rows; documents with
    * zero tokens produce no row (nothing to measure). */
  def repetitionStats(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs.select(id.cast("long").as("doc_id"),
      explode(graft.functions.TextFunctions.tokens(text)).as("token"))
    def r6(c: Column) = floor(c * 1000000 + 0.5) / 1000000.0
    toks.groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_count"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("top_count"),
        r6(col("top_count").cast("double") / col("n_tokens").cast("double"))
          .as("top_ratio"),
        r6(col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .as("distinct_ratio"))
  }

  /** Gopher-style rule-based quality filter (Rae et al. 2021, §A1.1) —
    * the standard pre-training heuristic battery, computed per document in
    * one pass: token-count bounds, mean-word-length bounds, symbol-to-word
    * ratio ('#' and '...'), alphabetic-word ratio, distinct-stopword
    * minimum, and the line-shape rules (bullet-start / ellipsis-end
    * fractions). Emits every measured stat plus the composite `pass` so
    * downstream filters can cut on individual rules.
    *
    * All ratios are rounded engine-stably to 6 dp and `pass` is evaluated
    * on the ROUNDED values (the DuckDB twin does the same, so the boolean
    * can't flap on the 17th bit). Char-count rules ('#', '...') run on
    * codegen'd string built-ins; the two token-shape rules use array
    * lambdas (interpreted) — acceptable here because the battery is
    * scan-bound, but at 100 TB the alpha test belongs in the same native
    * pass as marker_count if profiling shows it hot. Zero-token documents
    * fail the floor rule and score 0 on every ratio (0/0 guarded). */
  def gopherStats(docs: DataFrame, id: Column, text: Column,
                  minTokens: Long = 50, maxTokens: Long = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8,
                  minStopwords: Int = 2, maxBulletRatio: Double = 0.9,
                  maxEllipsisRatio: Double = 0.3): DataFrame = {
    import graft.functions.TextFunctions.{tokens, EnglishStopwords}
    import graft.functions.TokenExprs
    def r6(c: Column) = floor(c * 1000000 + 0.5) / 1000000.0
    val staged = docs.select(id.cast("long").as("doc_id"), text.as("__t"),
      tokens(text).as("toks"), split(text, "\n").as("lines"))
    val nTok = size(col("toks")).cast("long")
    val nLines = size(col("lines")).cast("double")
    val guard0 = (c: Column) => when(nTok === 0, lit(0.0)).otherwise(c)
    val hashCount = length(col("__t")) - length(translate(col("__t"), "#", ""))
    val ellipsisCount =
      (length(col("__t")) - length(regexp_replace(col("__t"), "\\.\\.\\.", ""))) / 3
    val stats = staged.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      guard0(r6(TokenExprs.token_length_sum(col("toks")) / nTok.cast("double")))
        .as("mean_word_len"),
      guard0(r6((hashCount + ellipsisCount).cast("double") / nTok.cast("double")))
        .as("symbol_ratio"),
      guard0(r6(size(filter(col("toks"), t => t.rlike("[a-zA-Z]")))
        .cast("double") / nTok.cast("double"))).as("alpha_ratio"),
      size(array_intersect(col("toks"),
        array(EnglishStopwords.map(lit): _*))).cast("long").as("n_stop"),
      r6(size(filter(col("lines"), l => trim(l).rlike("^[-*]")))
        .cast("double") / nLines).as("bullet_ratio"),
      r6(size(filter(col("lines"), l => l.endsWith("...")))
        .cast("double") / nLines).as("ellipsis_ratio"))
    stats.withColumn("pass",
      col("n_tokens").between(minTokens, maxTokens) &&
        col("mean_word_len").between(minMeanLen, maxMeanLen) &&
        col("symbol_ratio") < maxSymbolRatio &&
        col("alpha_ratio") > minAlphaRatio &&
        col("n_stop") >= minStopwords &&
        col("bullet_ratio") < maxBulletRatio &&
        col("ellipsis_ratio") < maxEllipsisRatio)
  }

  /** C4-style line + page cleaning (Raffel et al. 2020 §2.2): keep a LINE
    * iff it ends in terminal punctuation (. ! ? "), has ≥ `minLineWords`
    * whitespace words, and doesn't mention javascript; drop the whole PAGE
    * if fewer than `minKeptLines` lines survive, or it contains
    * "lorem ipsum" (case-insensitive), a curly brace, or any of
    * `badWords` (the paper's dirty-word list — pluggable, not shipped).
    * The paper's "fewer than 3 sentences" page rule is applied as
    * fewer-than-3 RETAINED lines, the standard reimplementation reading.
    *
    * Output per doc: n_lines, n_kept, page_kept, and clean_text (the kept
    * lines re-joined, NULL for dropped pages — a dropped page contributes
    * no text downstream, and the NULL makes that unfakeable). Entirely
    * per-row array expressions — a map-only plan with NO shuffle at any
    * scale; the lambda filters are interpreted, which is acceptable on a
    * scan-bound cleaning pass (same trade as [[gopherStats]]'s shape
    * rules). */
  def c4LineFilter(docs: DataFrame, id: Column, text: Column,
                   minLineWords: Int = 5, minKeptLines: Int = 3,
                   badWords: Seq[String] = Nil): DataFrame = {
    val keepLine = (l: Column) =>
      substring(l, -1, 1).isin(".", "!", "?", "\"") &&
        size(filter(split(l, "\\s+"), t => length(t) > 0)) >= minLineWords &&
        !lower(l).contains("javascript")
    val staged = docs.select(id.cast("long").as("doc_id"), text.as("__t"),
      split(text, "\n").as("lines"))
      .withColumn("kept", filter(col("lines"), keepLine))
    val pageKept = size(col("kept")) >= minKeptLines &&
      !lower(col("__t")).contains("lorem ipsum") &&
      !col("__t").contains("{") &&
      badWords.foldLeft(lit(true))((acc, w) =>
        acc && !lower(col("__t")).contains(w.toLowerCase))
    staged.select(
      col("doc_id"),
      size(col("lines")).cast("long").as("n_lines"),
      size(col("kept")).cast("long").as("n_kept"),
      pageKept.as("page_kept"),
      when(pageKept, array_join(col("kept"), "\n")).as("clean_text"))
  }

  /** Corpus-level top-k most frequent word n-grams — the boilerplate
    * detector (headers, license blocks, navigation chrome surface as
    * high-frequency n-grams; the winners feed a removal/cut list).
    * One explode + map-side-combined hash aggregation, then a global
    * ordered LIMIT (TakeOrderedAndProject — per-partition top-k on the
    * map side, k rows to the driver stage, never a global sort). Ties
    * break deterministically by the n-gram string. At 100 TB the count
    * aggregation can run on the native shingle HASHES with the winners'
    * strings re-derived from a broadcast semi-join of the top hash set —
    * the string groupBy here keeps the operator single-stage and its
    * output directly readable. */
  /** Fixed-window document chunking with overlap — the context-window
    * preparation step of RAG indexing and long-document training:
    * `window` tokens per chunk, a new chunk every `stride` tokens
    * (overlap = window − stride), the last chunk covering the tail.
    * Chunk count is the closed form 1 + ceil-div(max(0, n − window),
    * stride), so an SQL twin replays the split exactly.
    *
    * Map-only column ops end to end (split → sequence → explode →
    * slice) — no shuffle, no UDF; at 100 TB this is scan-bound like
    * every per-document transform. Empty documents contribute no row
    * (a chunk of nothing is not a training example). */
  def chunkDocuments(docs: DataFrame, id: Column, text: Column,
                     window: Int = 16, stride: Int = 12): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride in [1, window], got $stride (window $window)")
    docs.select(id.cast("long").as("doc_id"), text.as("text"))
      .withColumn("toks",
        filter(split(col("text"), "\\s+"), t => length(t) > 0))
      .withColumn("n", size(col("toks")))
      .where(col("n") > 0)
      .withColumn("nchunks",
        lit(1) + expr(
          s"(greatest(n - $window, 0) + ${stride - 1}) div $stride").cast("int"))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0), col("nchunks") - 1)).as("chunk_idx"))
      .withColumn("start", col("chunk_idx") * stride)
      .withColumn("chunk", slice(col("toks"), col("start") + 1, lit(window)))
      .select(col("doc_id"), col("chunk_idx"), col("start").cast("long").as("start"),
        size(col("chunk")).cast("long").as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  def topNgrams(docs: DataFrame, text: Column, n: Int, k: Int): DataFrame =
    docs.select(graft.functions.TextFunctions.tokens(text).as("toks"))
      .select(explode(
        graft.functions.TextFunctions.shingles(col("toks"), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("occ"))
      .orderBy(col("occ").desc, col("ngram").asc)
      .limit(k)

  /** Top-k collocations by integer LIFT over the bigram table — the
    * PMI-style association step of tokenizer/vocab curation (which word
    * pairs cohere strongly enough to deserve a merged token), with the
    * log replaced by its monotone integer argument so the ranking is
    * oracle-exact: PMI = log lift, so ordering by
    * `lift_micro = ((c_ab·10^6) div l_a)·T div r_b` (c_ab = bigram
    * count, l_a/r_b = left/right marginal bigram counts, T = total
    * bigrams) IS the PMI ordering with no engine-divergent `ln`
    * anywhere. Division order is canonical and bounded: c_ab ≤ l_a keeps
    * the first quotient ≤ 10^6, so the product with T stays in a long
    * up to trillions of bigrams.
    *
    * Scale shape: one explode pass → map-side-combined bigram counts;
    * marginals are two more aggregations OF THE COUNTS frame (not the
    * corpus); the final ordering is orderBy+limit = TakeOrdered. The
    * marginal joins are size-gated broadcasts (vocab-sized, not
    * corpus-sized). */
  def pmiCollocations(docs: DataFrame, text: Column, minCount: Long = 5,
                      k: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val bg = docs
      .select(graft.functions.TextFunctions.tokens(text).as("toks"))
      .select(explode(
        graft.functions.TextFunctions.shingles(col("toks"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
      .withColumn("l", substring_index(col("bigram"), " ", 1))
      .withColumn("r", substring_index(col("bigram"), " ", -1))
      .localCheckpoint(false)
    val total = bg.agg(sum("c_ab")).first().getLong(0)
    val lefts = graft.operators.Scoring.sizeGatedBroadcast(
      bg.groupBy("l").agg(sum("c_ab").as("l_a")))
    val rights = graft.operators.Scoring.sizeGatedBroadcast(
      bg.groupBy("r").agg(sum("c_ab").as("r_b")))
    bg.where(col("c_ab") >= minCount)
      .join(lefts, "l").join(rights, "r")
      .withColumn("lift_micro",
        expr(s"((c_ab * 1000000) div l_a) * ${total}L div r_b"))
      .select("bigram", "c_ab", "lift_micro")
      .orderBy(col("lift_micro").desc, col("bigram").asc)
      .limit(k)
  }

  /** Streaming sequence packing — the training-data layout step that
    * concatenates documents into budget-sized context windows: within each
    * `part` stream, documents are laid out in ascending id order and each
    * is assigned the pack its FIRST token lands in (`start_offset div
    * budget`). Deterministic, one shuffle (the per-part window); parts
    * bound the window partitions, so scale-out is by the partition column
    * (source, shard, date...), never a global sort. */
  def packSequences(docs: DataFrame, id: Column, part: Column,
                    nTokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "pack budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("part").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs.select(id.cast("long").as("doc_id"), part.cast("string").as("part"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"start_offset div ${budget}L"))
  }

  /** Materialize [[packSequences]]' assignments into the packed training
    * rows: one row per (part, pack) with the member documents' text joined
    * in id order by `sep`. The per-pack concat is an ordered group-concat
    * (sort_array over (doc_id, text) structs — deterministic, one
    * aggregation); pack text length is bounded by budget + one straddling
    * document, so rows stay bounded regardless of corpus size. */
  def packedTexts(docs: DataFrame, id: Column, part: Column, text: Column,
                  nTokens: Column, budget: Long, sep: String = "\n"): DataFrame = {
    // join on (doc_id, part): ids only need to be unique WITHIN a part
    // (per-shard id sequences are the normal case) — a doc_id-only join
    // would splice rows across parts when ids repeat
    val assigned = packSequences(docs, id, part, nTokens, budget)
      .join(docs.select(id.cast("long").as("doc_id"),
        part.cast("string").as("part"), text.as("__text")), Seq("doc_id", "part"))
    assigned.groupBy(col("part"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        array_join(transform(
          sort_array(collect_list(struct(col("doc_id"), col("__text")))),
          s => s.getField("__text")), sep).as("pack_text"))
  }

  /** First-fit-decreasing sequence packing — the bin-packing layout
    * training pipelines want when token EFFICIENCY matters more than
    * stream order: within each `part`, documents sort by (n_tokens DESC,
    * doc_id ASC) and each goes into the FIRST pack with enough remaining
    * budget, else opens a new pack. No document straddles packs (contrast
    * [[packSequences]], whose sequential fill assigns a straddling doc to
    * the pack its first token lands in); a document larger than the
    * budget gets a pack of its own. FFD is the classic 11/9·OPT+1
    * guarantee, and on real corpora wastes far less tail budget than
    * sequential fill (see COVERAGE.md's measured comparison).
    *
    * Scale shape: FFD is inherently sequential WITHIN a part, so the
    * parallelism axis is parts (source/shard/date...) — the same contract
    * as the per-part window in [[packSequences]]: one shuffle by part,
    * each group packed independently; memory per group is O(docs in
    * part). The first-fit scan is O(packs) per doc — fine for the
    * budget-bounded pack counts real shards produce (a segment tree over
    * remaining capacities is the textbook upgrade if a part ever holds
    * millions of packs). */
  def packSequencesFfd(docs: DataFrame, id: Column, part: Column,
                       nTokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "pack budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(id.cast("long").as("doc_id"), part.cast("string").as("part"),
        nTokens.cast("long").as("n_tokens"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (p: String, it: Iterator[(Long, String, Long)]) =>
        val sorted = it.toArray.sortBy { case (docId, _, n) => (-n, docId) }
        val remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.iterator.map { case (docId, _, n) =>
          var i = 0
          while (i < remaining.length && remaining(i) < n) i += 1
          if (i == remaining.length) remaining += (budget - n)
          else remaining(i) -= n
          (docId, p, n, i.toLong)
        }
      }
      .toDF("doc_id", "part", "n_tokens", "pack_id")
  }

  /** Union of two perspectives of the same events (e.g. a flow contributes
    * a document for both endpoint IPs — reference FlowPreLDA.scala:139).
    * Union BEFORE the aggregation so a single shuffle builds both. */
  /** TF-IDF-weighted cosine all-pairs similarity over word n-gram terms
    * (the WEIGHTED upgrade of [[Dedup.ngramJaccardPairs]]'s set Jaccard;
    * the inverted-index all-pairs shape of Bayardo et al., WWW 2007):
    * term weight m = ⌊tf·ln(N/df)·10⁶ + 0.5⌋ in exact integer micro-units,
    * so dot products and squared norms are partition-order-free integer
    * sums; cosine = num / (√‖a‖²·√‖b‖²) is three IEEE ops both engines
    * replay identically, thresholded UNROUNDED and emitted 6-dp-rounded.
    *
    * Scale shape: narrow (doc, term, m) rows; candidate pairs come from
    * ONE equi self-join on the term key (never a cross product), with the
    * standard df-cut dropping terms in more than `maxDf` docs — hot terms
    * are the quadratic fan-out risk AND carry near-zero idf; norms are
    * computed from the FILTERED vectors so numerator and denominator see
    * the same term set. Long-exactness bound: Σ m² per doc must stay
    * below 2⁶³ — m ≤ tf·ln(N)·10⁶, comfortable for real corpora where
    * n-gram tf is near 1 (a doc repeating one 3-gram 10⁵ times would
    * need the df-cut it would also deserve). */
  def tfidfCosinePairs(docs: DataFrame, id: Column, text: Column, n: Int,
                       threshold: Double, maxDf: Long = 1000): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val nDocs = docs.count()
    val tf = docs.select(id.cast("long").as("doc_id"),
        explode(graft.functions.ShingleHash.shingle_hashes_all(text, n))
          .as("sh"))
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("tf"))
      .localCheckpoint(false) // feeds df counts AND the weighted vectors
    val dfq = tf.groupBy("sh").agg(count(lit(1)).as("df"))
    val weighted = tf.join(dfq, "sh").where(col("df") <= maxDf)
      .select(col("doc_id"), col("sh"),
        floor(col("tf") * log(lit(nDocs.toDouble) / col("df")) * 1000000
          + 0.5).cast("long").as("m"))
      .localCheckpoint(false) // feeds norms AND both join sides
    val norms = weighted.groupBy("doc_id")
      .agg(sum(col("m") * col("m")).as("n2"))
    val num = weighted.as("a")
      .join(weighted.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(sum(col("a.m") * col("b.m")).as("num"))
    val cos = col("num").cast("double") /
      (sqrt(col("n2_a").cast("double")) * sqrt(col("n2_b").cast("double")))
    num
      .join(norms.select(col("doc_id").as("id_a"), col("n2").as("n2_a")), "id_a")
      .join(norms.select(col("doc_id").as("id_b"), col("n2").as("n2_b")), "id_b")
      .where(cos >= threshold)
      .select(col("id_a"), col("id_b"),
        (floor(cos * 1000000 + 0.5) / 1000000.0).as("cosine"))
  }

  /** DEFLATE compression-ratio quality signal (Gopher §A2.2 used it;
    * near-duplicate boilerplate and low-entropy spam compress far below
    * natural prose, random noise barely compresses): per doc,
    * compressed_len / raw_len in 1e-6 fixed point over UTF-8 bytes,
    * level-6 zlib. No SQL twin exists (DuckDB has no deflate), so this
    * ships spec-locked with pinned golden ratios — the honest gate-less
    * operator, stated as such. mapPartitions with ONE shared Deflater
    * per partition (reset between docs — allocation-free hot loop). */
  def compressionRatios(docs: DataFrame, id: Column, text: Column): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(id.cast("long").as("doc_id"), text.as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val defl = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](8192)
        it.map { case (docId, t) =>
          val raw = if (t == null) Array.emptyByteArray
            else t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          defl.reset()
          defl.setInput(raw)
          defl.finish()
          var comp = 0L
          while (!defl.finished) comp += defl.deflate(buf)
          val ratio = if (raw.isEmpty) 0L
            else math.floor(comp.toDouble / raw.length * 1000000 + 0.5).toLong
          (docId, raw.length.toLong, comp, ratio)
        }
      }
      .toDF("doc_id", "n_bytes", "n_compressed", "ratio_micro")
  }

  /** HTML → text extraction (the first step of every web-crawl curation
    * pipeline, C4/CCNet §preprocessing): drop script/style blocks
    * wholesale, strip remaining tags to spaces, decode the six common
    * entities (&amp; LAST, so "&amp;lt;" decodes once, not twice),
    * collapse whitespace. Pure column expressions — map-only, zero
    * shuffle, whole-stage codegen. Patterns are Java↔RE2-portable (the
    * x9 PII discipline): no backreferences (script and style are two
    * passes), non-greedy + (?is) only. */
  def stripHtml(docs: DataFrame, id: Column, html: Column): DataFrame = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    val clean = trim(regexp_replace(decoded, "\\s+", " "))
    docs.select(id.cast("long").as("doc_id"), clean.as("clean_text"))
      .withColumn("n_chars_clean", length(col("clean_text")).cast("long"))
  }

  /** fastText-style LINEAR quality classifier scoring (Joulin et al.
    * 2016; the model-based quality filter of CCNet / GPT-3-style
    * curation): hashed unigram+bigram features over `numBuckets`
    * buckets, a per-bucket weight, mean-pooled to a logit, sigmoid to a
    * keep probability. Weights here are a fixed closed-form table
    * (wμ(b) = ((b·2654435761 + 911382323) mod P) mod 1000001 − 500000,
    * micro-units in [−0.5, 0.5]) standing in for trained parameters —
    * the DATAFLOW is the product: per-row feature hashing, bounded
    * weight lookup, integer-exact pooling. Weights are in 1e-6 fixed
    * point so the per-doc sum is partition-order-independent; the one
    * sigmoid is a single IEEE exp 6-dp-rounded (the x16 discipline).
    *
    * Scale shape: MAP-ONLY — features fold per row inside one
    * `aggregate` HOF (no explode, no shuffle, no weight-table join: the
    * closed form IS the lookup), so at 100 TB this is a pure scan.
    * Output: (doc_id, n_feats, s_micro, prob, keep) for docs with ≥ 1
    * token; keep ⇔ s_micro ≥ 0 (⇔ prob ≥ 0.5, decided in exact
    * integers, never on a float boundary). */
  def linearQualityScores(docs: DataFrame, id: Column, text: Column,
                          numBuckets: Int = 1024): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    val tk = graft.functions.TextFunctions.tokens(text)
    val bi = when(size(tk) >= 2,
      zip_with(slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val feats = concat(tk, bi)
    def wMicro(f: Column): Column = {
      val b = graft.functions.TextFunctions.polyHash(f) % numBuckets
      ((b * lit(2654435761L) + lit(911382323L)) % lit(1000000007L)) %
        lit(1000001L) - lit(500000L)
    }
    docs.select(id.cast("long").as("doc_id"),
        size(feats).cast("long").as("n_feats"),
        aggregate(feats, lit(0L), (acc, f) => acc + wMicro(f)).as("s_micro"))
      .where(col("n_feats") > 0)
      .withColumn("prob",
        floor(lit(1.0) / (lit(1.0) +
            exp(-(col("s_micro").cast("double") /
              (col("n_feats") * lit(1000000.0))))) * 1000000 + 0.5) / 1000000.0)
      .withColumn("keep", col("s_micro") >= 0)
  }

  def dualPerspective(df: DataFrame,
                      docA: Column, wordA: Column,
                      docB: Column, wordB: Column,
                      weight: Column = lit(1L)): DataFrame = {
    val a = df.select(docA.cast("string").as("doc"), wordA.cast("string").as("word"),
      weight.cast("long").as("w"))
    val b = df.select(docB.cast("string").as("doc"), wordB.cast("string").as("word"),
      weight.cast("long").as("w"))
    a.union(b).groupBy("doc", "word").agg(sum("w").as("count"))
  }
}
