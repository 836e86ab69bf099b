package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale document deduplication operators.
  *
  * All variants follow the inverted-index pattern: per-doc signatures are
  * computed with codegen'd array expressions (no UDFs), then candidate
  * generation is an explode + shuffle-on-key + self-join — the standard
  * scalable shape (pairs are only materialized for docs sharing a bucket,
  * never the full n² cross product). Exact-arithmetic hashes (integer
  * polynomial rolling hashes mod a prime) keep results engine-independent
  * and reproducible.
  */
object Dedup {

  /** Exact duplicates: groups identical `text`, keeps the minimum id as the
    * canonical representative. Returns (content_hash, keep_id, dup_count)
    * per duplicated group. The group key is the 192-bit (xxhash64, md5)
    * pair — shuffle rows stay narrow (no full-text key) and birthday
    * collisions are unobservable at any corpus size, unlike a single
    * 2^30-range polynomial hash (~50% collision odds by ~37k distinct
    * docs). `content_hash` stays the polynomial hash for oracle parity. */
  def exactDuplicates(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(xxhash64(text).as("__h64"), md5(text).as("__h128"))
      .agg(min(polyHash(text)).as("content_hash"),
        min(id).as("keep_id"), count(lit(1)).as("dup_count"))
      .where(col("dup_count") > 1)
      .select("content_hash", "keep_id", "dup_count")

  /** Per-doc word n-gram shingle set (distinct shingle hashes).
    * NOTE: inside `shingles` the token array is referenced once per shingle
    * position; pass an ATTRIBUTE (a column computed in a previous select),
    * never the raw `tokens(text)` expression — expression children aren't
    * memoized, so an inline tokenizer would re-run per position (O(len²)).
    * [[shingledDocs]] is the staged form that gets this right. */
  def shingleHashes(toks: Column, n: Int): Column =
    array_distinct(transform(shingles(toks, n), s => polyHash(s)))

  /** (doc_id, sh: array<long>) — distinct shingle hashes per doc, via the
    * single-pass native expression (the composed HOF chain is kept in
    * [[shingleHashes]] for composability; it is ~50× slower interpreted). */
  def shingledDocs(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    df.select(id.cast("long").as("doc_id"),
        graft.functions.ShingleHash.shingle_hashes(text, n).as("sh"))
      .where(size(col("sh")) > 0)

  /** Exact n-gram Jaccard near-duplicates via inverted index:
    * explode distinct shingles → self-join on shingle → intersection counts
    * → Jaccard = |∩| / (|A| + |B| - |∩|). Returns pairs (id_a < id_b) with
    * jaccard >= threshold. Hot (very common) shingles are the skew risk at
    * scale — `maxShingleFreq` drops shingles shared by more than that many
    * docs (standard df-cut; near-dup pairs share rare shingles too). */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column, n: Int,
                        threshold: Double, maxShingleFreq: Long = 1000): DataFrame = {
    // One materialization of the narrow exploded (doc_id, shingle) rows via
    // LAZY localCheckpoint: every consumer — hot-set, both join sides,
    // sizes — reads the blocks computed by the first action, so the
    // (expensive) shingle hashing runs once. Unlike .cache() there is no
    // CacheManager entry pinning storage for the session lifetime: the
    // blocks are owned by this frame's RDD and freed by the ContextCleaner
    // when callers drop the result (measured: AQE never reuses the
    // exchange across these consumers, so an un-materialized plan would
    // re-hash the corpus four times).
    val inv = shingledDocs(df, id, text, n)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .localCheckpoint(false)
    // df-cut as a broadcast anti-join against the (tiny) hot-shingle set:
    // map-side-combined groupBy beats a window's full sort-shuffle, and the
    // anti join is broadcast — no extra wide shuffle of the inverted index.
    val hot = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df") > maxShingleFreq)
      .select("shingle")
    val filtered = inv.join(broadcast(hot), Seq("shingle"), "left_anti")
    // Sizes from the FILTERED index: numerator and denominator must see the
    // same shingle set, or Jaccard is systematically underestimated for
    // docs containing hot shingles when the cut is active.
    val sizes = filtered.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = filtered.as("a")
      .join(filtered.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), (floor((col("jaccard")) * 1000000 + 0.5) / 1000000.0).as("jaccard"))
  }

  /** MinHash signature per doc: k affine hashes over the shingle-hash set.
    * Staged as two projections so the (expensive) shingle hashing runs once
    * per doc, not once per signature position — Catalyst's CollapseProject
    * keeps non-cheap multiply-referenced aliases in their own stage. */
  def minHashDocs(df: DataFrame, id: Column, text: Column,
                  n: Int, numHashes: Int): DataFrame =
    shingledDocs(df, id, text, n)
      .select(col("doc_id"), minHashSignature(col("sh"), numHashes).as("sig"))

  /** MinHash + LSH banding: docs sharing any band bucket become candidate
    * pairs; est_jaccard = fraction of matching signature positions.
    * numHashes = bands * rowsPerBand.
    *
    * Scale shape: the self-join runs on NARROW (doc_id, band, key) rows —
    * signatures are re-attached to the (much smaller) candidate-pair set
    * afterwards, so the band shuffle never carries arrays and the
    * distinct() dedups 3-column rows, not 2×signature payloads. AQE picks
    * broadcast for the sig side when it fits. */
  /** Narrow (doc_id, band, key) rows from a (doc_id, sig) frame: per band,
    * the key is the '_'-joined signature positions of that band. */
  private def bandedKeys(docs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    docs.select(col("doc_id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            concat_ws("_", (0 until rowsPerBand).map(r =>
              col("sig").getItem(b * rowsPerBand + r).cast("string")): _*).as("key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))

  def minHashLshPairs(df: DataFrame, id: Column, text: Column,
                      n: Int = 5, bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val numHashes = bands * rowsPerBand
    // Lazy localCheckpoint instead of cache: the minhashing runs once for
    // the band explode and both signature re-attach joins, and the blocks
    // are GC-scoped (freed when callers drop the result) instead of pinned
    // in the session CacheManager.
    val docs = minHashDocs(df, id, text, n, numHashes)
      .localCheckpoint(false)
    val banded = bandedKeys(docs, bands, rowsPerBand)
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      // native agreement count (SignatureAgreeExpr) — the interpreted
      // zip_with/filter form allocated two arrays per candidate pair and
      // was the d3 hot path at 10×; same integer → same double, results
      // bit-identical
      .withColumn("est_jaccard",
        floor((graft.functions.SignatureOps.signature_agree(col("sig_a"), col("sig_b"))
          .cast("double") / numHashes) * 1000000 + 0.5) / 1000000.0)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** Incremental near-dup check — the daily-ingest shape: MinHash-LSH
    * candidate pairs between a NEW batch and the existing corpus (plus
    * within the new batch), never old-old. At 100 TB the corpus side
    * contributes only its narrow (doc_id, band, key) rows and signatures
    * — both computable once and persistable as the index — while the
    * band self-join is replaced by new-side × all-banded: candidate
    * volume scales with the BATCH, not the corpus. Returns (id_a, id_b,
    * est_jaccard) with at least one side in the new batch (ids
    * normalized id_a < id_b). */
  def incrementalLshPairs(newDocs: DataFrame, corpus: DataFrame,
                          id: Column, text: Column, n: Int = 5,
                          bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val numHashes = bands * rowsPerBand
    val tagged = newDocs
      .select(id.cast("long").as("doc_id"), text.cast("string").as("text"),
        lit(true).as("is_new"))
      .union(corpus.select(id.cast("long").as("doc_id"),
        text.cast("string").as("text"), lit(false).as("is_new")))
    // one signature pass over old ∪ new (in production the old side's
    // signatures come from the persisted index instead)
    val docs = minHashDocs(tagged, col("doc_id"), col("text"), n, numHashes)
      .localCheckpoint(false)
    val banded = bandedKeys(docs, bands, rowsPerBand)
      .localCheckpoint(false)
    val newIds = tagged.where(col("is_new")).select("doc_id")
    val bandedNew = banded.join(newIds, Seq("doc_id"), "left_semi")
    val cand = bandedNew.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("id_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("id_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard",
        floor((graft.functions.SignatureOps.signature_agree(col("sig_a"), col("sig_b"))
          .cast("double") / numHashes) * 1000000 + 0.5) / 1000000.0)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** Leakage-safe train/val/test splits: all members of a near-dup
    * cluster land in the SAME split (splitting on the document id would
    * leak near-copies of training documents into the eval split — the
    * standard contamination failure). Clusters come from the n-gram
    * Jaccard pair graph; unclustered docs are their own cluster; the
    * split is [[Sampling.splits]]' deterministic hash-mod bucketing of
    * the CLUSTER id. Returns (doc_id, cluster, split). */
  def leakageSafeSplits(df: DataFrame, id: Column, text: Column, n: Int,
                        threshold: Double, shares: Seq[(String, Int)],
                        maxShingleFreq: Long = 1000): DataFrame = {
    val clusters = connectedComponents(
      ngramJaccardPairs(df, id, text, n, threshold, maxShingleFreq))
    val labeled = df.select(id.cast("long").as("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
    Sampling.splits(labeled, col("cluster"), shares)
      .select("doc_id", "cluster", "split")
  }

  /** Connected components over an undirected near-dup pair graph —
    * cluster assignment for dedup (each document maps to the MINIMUM id
    * reachable through pair edges; the component min is the canonical
    * representative). Min-label propagation WITH pointer doubling: every
    * round each node (1) adopts the smallest label among itself and its
    * neighbors, then (2) shortcuts to its label's label (l(v) := l(l(v)),
    * valid because every label value is itself a node id, so the label
    * frame doubles as the parent function). Plain propagation converges in
    * O(component diameter) rounds — a 10⁴-long chain means 10⁴ driver
    * rounds; the shortcut step squares the propagation distance per round,
    * so convergence is O(log diameter) with each round two joins + one
    * map-side-combined min aggregation over narrow (node, label) rows.
    * Labels are monotone non-increasing and bounded below by the component
    * min, and the fixpoint is constant per component (for any edge the
    * stable min condition forces equal labels), so the result — each node
    * → component min — is iteration-independent, exactly reproducible, and
    * SQL-twinnable via a recursive closure. The driver only sees the
    * per-round exact label sum (convergence check); edge and label frames
    * are checkpointed so plans stay flat across rounds. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    val e = pairs.select(col("id_a").cast("long").as("a"),
      col("id_b").cast("long").as("b"))
    val undirected = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = undirected.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    // labels are monotonically non-increasing, so convergence == the label
    // sum stopped falling: ONE tiny aggregate per round, no compare join.
    // decimal(38) keeps the sum exact at any id magnitude / corpus size.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head()
        .getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var it = 0
    // emptiness is tested STRUCTURALLY — a non-empty graph whose id sum
    // happens to be 0 (negative/hash-derived ids) must still propagate.
    var converged = labels.isEmpty
    while (!converged && it < maxIters) {
      // (1) hash-to-min: each node takes the min label over its closed
      // neighborhood. Checkpointed so the shortcut join below reads one
      // materialization instead of recomputing the aggregation twice.
      val prop = undirected.join(labels, undirected("a") === labels("node"))
        .select(col("b").as("node"), col("label"))
        .union(labels)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint(false)
      // (2) pointer doubling: l(v) := l(l(v)). Inner join is total — every
      // label value is a node id present in `prop` (labels start at self
      // and only ever take values that are other nodes' labels). The
      // parent side is checkpointed SEPARATELY so this is not a self-join
      // at the plan level: self-join attribute dedup over a checkpointed
      // LogicalRDD leaves its origin constraints referencing pre-dedup
      // attribute ids, which crashes Union constraint rewriting in the
      // next round's propagation step.
      val parents = prop
        .select(col("node").as("p_node"), col("label").as("p_label"))
        .localCheckpoint(false)
      val short = prop.join(parents, col("label") === col("p_node"))
        .select(col("node"), col("p_label").as("label"))
        .localCheckpoint()
      val s = labelSum(short)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = short
      it += 1
    }
    if (converged && it > 0)
      Console.err.println(s"connectedComponents: converged in $it rounds")
    // a silent partial result would diverge from the closure semantics the
    // doc (and the d6 oracle) promise — fail loudly instead
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds " +
          "(a component's diameter exceeds maxIters); raise maxIters")
    labels.select(col("node").as("doc_id"), col("label").as("cluster"))
  }

  /** Benchmark decontamination: corpus documents sharing ANY word n-gram
    * with a benchmark/eval set (the standard 13-gram contamination rule;
    * n configurable). Benchmark shingles are distinct and BROADCAST —
    * eval sets are tiny next to a training corpus — so the check is one
    * broadcast left-semi join on shingle hashes: no shuffle of the corpus
    * beyond its scan, no pair materialization. Returns the distinct
    * contaminated doc ids; anti-join the corpus against them to clean. */
  def contaminatedDocs(corpus: DataFrame, id: Column, text: Column,
                       benchmark: DataFrame, benchText: Column,
                       n: Int = 13): DataFrame = {
    val benchShingles = benchmark
      .select(graft.functions.ShingleHash.shingle_hashes(benchText, n).as("sh"))
      .select(explode(col("sh")).as("shingle"))
      .distinct()
    shingledDocs(corpus, id, text, n)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .join(broadcast(benchShingles), Seq("shingle"), "left_semi")
      .select("doc_id")
      .distinct()
  }

  /** FUZZY benchmark decontamination: corpus documents whose MinHash
    * signature agrees with some benchmark/eval document's on at least
    * `minEstJaccard` of positions — the paraphrase-tolerant complement to
    * [[contaminatedDocs]]' exact n-gram rule (an eval item lightly
    * rephrased in the training set shares few verbatim 13-grams but keeps
    * high shingle-set Jaccard). Same MinHash+banding machinery as
    * [[minHashLshPairs]]; the benchmark side (tiny by definition) is
    * BROADCAST in both the band join and the signature verify, so the
    * corpus contributes one signature pass and narrow (doc_id, band, key)
    * rows — candidate volume scales with the BENCHMARK, never
    * corpus×corpus. A benchmark doc present verbatim in the corpus agrees
    * on every position (est 1.0). Returns one row per contaminated corpus
    * doc: (doc_id, est_jaccard = max agreement over benchmark matches). */
  def fuzzyContaminatedDocs(corpus: DataFrame, id: Column, text: Column,
                            benchmark: DataFrame, benchId: Column,
                            benchText: Column, n: Int = 5, bands: Int = 4,
                            rowsPerBand: Int = 2,
                            minEstJaccard: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val docs = minHashDocs(corpus, id, text, n, numHashes)
      .localCheckpoint(false)
    val bench = minHashDocs(benchmark, benchId, benchText, n, numHashes)
      .select(col("doc_id").as("bench_id"), col("sig").as("bench_sig"))
      .localCheckpoint(false)
    val benchBanded = bandedKeys(
      bench.select(col("bench_id").as("doc_id"), col("bench_sig").as("sig")),
      bands, rowsPerBand)
      .select(col("doc_id").as("bench_id"), col("band"), col("key"))
    val cand = bandedKeys(docs, bands, rowsPerBand)
      .join(broadcast(benchBanded), Seq("band", "key"))
      .select(col("doc_id"), col("bench_id"))
      .distinct()
    cand
      .join(docs, "doc_id")
      .join(broadcast(bench), "bench_id")
      .withColumn("est",
        floor((graft.functions.SignatureOps.signature_agree(col("sig"), col("bench_sig"))
          .cast("double") / numHashes) * 1000000 + 0.5) / 1000000.0)
      .where(col("est") >= minEstJaccard)
      .groupBy("doc_id")
      .agg(max(col("est")).as("est_jaccard"))
  }

  /** Per-document duplicated-span profile — the exact-substring dedup
    * signal (span-level duplication à la "Deduplicating Training Data
    * Makes Language Models Better": a span is duplicated when the same
    * word n-gram occurs anywhere else in the corpus — another document or
    * another position of the same document). Returns per doc the total
    * span count (token positions admitting an n-gram), the duplicated-span
    * count, and their ratio — the per-doc fraction of content that is
    * verbatim-repeated, the standard cut signal for substring-level dedup.
    *
    * Scale shape: spans are narrow (doc_id, hash) longs from the one-pass
    * positional native expression ([[graft.functions.ShingleHash
    * .shingle_hashes_all]]); occurrence counts are one map-side-combined
    * hash aggregation, and the count re-attach is a shuffle join on the
    * hash key both sides already produced — no pair materialization, no
    * text carried past the scan. The span frame is lazily checkpointed
    * once for its two consumers (counts + join-back). */
  def duplicatedSpans(df: DataFrame, id: Column, text: Column,
                      n: Int = 13): DataFrame = {
    val spans = df.select(id.cast("long").as("doc_id"),
        explode(graft.functions.ShingleHash.shingle_hashes_all(text, n)).as("h"))
      .localCheckpoint(false)
    val occ = spans.groupBy("h").agg(count(lit(1)).as("occ"))
    spans.join(occ, "h")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("occ") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        (floor((col("n_dup_spans").cast("double") / col("n_spans")) * 1000000
          + 0.5) / 1000000.0).as("dup_ratio"))
  }

  /** Dedup RETENTION: the decision step that turns near-dup clusters into
    * a kept/dropped corpus. Resolves clusters over the n-gram Jaccard pair
    * graph ([[ngramJaccardPairs]] → [[connectedComponents]]), scores every
    * document with [[graft.functions.TextFunctions.qualityScore]], and
    * keeps exactly ONE document per cluster — the highest 6-dp-rounded
    * quality, lowest doc_id on ties. Unclustered documents form singleton
    * clusters (cluster = own id) and are always kept, so the output is a
    * complete per-document decision frame: (doc_id, cluster, quality,
    * kept). Anti-join the corpus on kept = false to materialize the clean
    * split.
    *
    * Scale shape: quality is map-side arithmetic on the scan; the cluster
    * attach is one shuffle join on doc_id; the per-cluster winner is a
    * map-side-combined `max(struct(quality, -doc_id))` — no window, no
    * sort — re-attached by one join on the (few) cluster keys. */
  def retainBest(df: DataFrame, id: Column, text: Column, n: Int,
                 threshold: Double, maxShingleFreq: Long = 1000): DataFrame = {
    val clusters = connectedComponents(
      ngramJaccardPairs(df, id, text, n, threshold, maxShingleFreq))
    val scored = df
      .select(id.cast("long").as("doc_id"), tokens(text).as("toks"))
      .select(col("doc_id"),
        (floor(qualityScore(col("toks")) * 1000000 + 0.5) / 1000000.0)
          .as("quality"))
    // lazy localCheckpoint: `labeled` feeds BOTH the winner aggregation
    // and the verdict join below — without it the whole subtree
    // (tokenize + qualityScore over every doc, the cluster left join)
    // appears twice in the plan and computes twice (r13 plan audit:
    // duplicated SortMergeJoin subtrees under d8)
    val labeled = scored.join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .localCheckpoint(false)
    val winners = labeled.groupBy("cluster")
      .agg(max(struct(col("quality"), (-col("doc_id")).as("neg"),
        col("doc_id").as("kid"))).as("m"))
      .select(col("cluster"), col("m.kid").as("keep_id"))
    labeled.join(winners, "cluster")
      .select(col("doc_id"), col("cluster"), col("quality"),
        (col("doc_id") === col("keep_id")).as("kept"))
  }

  /** SimHash near-duplicate pairs via band blocking — the pairing step for
    * [[simHashDocs]] fingerprints. The `bits`-bit fingerprint splits into
    * `bands` contiguous blocks; by pigeonhole, any pair within Hamming
    * distance `maxHamming` < `bands` shares at least one UNCHANGED block,
    * so blocking on (band, block bits) has exact recall for that radius.
    *
    * The candidate join runs over DISTINCT fingerprints, not docs — the
    * load-bearing move for the classic simhash skew at crawl scale: a
    * template page shared by millions of docs is ONE fingerprint, so its
    * band bucket contributes one row per band instead of a quadratic
    * doc bucket (join work is fingerprint-space-bound; only the OUTPUT
    * expansion is pair-count-bound, which any all-pairs contract must
    * pay). Exactly-equal fingerprints short-circuit the bands entirely
    * (a same-key self-join at Hamming 0); unequal candidate fingerprints
    * are verified ONCE per fingerprint pair with the exact popcount of
    * the XOR, then expand to doc pairs through two narrow joins. */
  def simHashNearDupPairs(df: DataFrame, id: Column, text: Column,
                          bits: Int = 16, bands: Int = 4,
                          maxHamming: Int = 3,
                          tokenHash: Column => Column = DefaultTokenHash): DataFrame = {
    require(bits % bands == 0, s"bands ($bands) must divide bits ($bits)")
    require(maxHamming < bands,
      s"pigeonhole recall needs maxHamming ($maxHamming) < bands ($bands)")
    val bandBits = bits / bands
    val fp = simHashDocs(df, id, text, bits, tokenHash).localCheckpoint(false)

    // Hamming-0 pairs: identical fingerprints, paired by one equi-join on
    // the fingerprint itself — work and output are both the pair count.
    val same = fp.as("a").join(fp.as("b"),
        col("a.simhash") === col("b.simhash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        lit(0L).as("hamming"))

    val fpPairs = bandedFpPairs(fp.select(col("simhash")).distinct(),
      bands, bandBits, maxHamming)
    // expand to doc pairs; fp_a ≠ fp_b means the two member sets are
    // disjoint, so least/greatest normalizes each unordered pair exactly once
    val cross = fpPairs
      .join(fp.select(col("doc_id").as("__da"), col("simhash").as("fp_a")), "fp_a")
      .join(fp.select(col("doc_id").as("__db"), col("simhash").as("fp_b")), "fp_b")
      .select(least(col("__da"), col("__db")).as("id_a"),
        greatest(col("__da"), col("__db")).as("id_b"),
        col("hamming").cast("long").as("hamming"))
    same.unionByName(cross)
  }

  /** Distinct UNEQUAL fingerprint pairs within `maxHamming`, via band
    * blocking + exact popcount — the fingerprint-space candidate core
    * shared by [[simHashNearDupPairs]] and [[simHashClusters]]. */
  private def bandedFpPairs(fps: DataFrame, bands: Int, bandBits: Int,
                            maxHamming: Int): DataFrame = {
    val banded = fps.select(col("simhash"),
        explode(array((0 until bands).map { b =>
          // Unsigned shift + mask: with bits=64 the sign bit is data, and a
          // signed shiftright+% would sign-extend and emit negative keys for
          // half the fingerprints, splitting identical blocks across keys.
          struct(lit(b).as("band"),
            shiftrightunsigned(col("simhash"), b * bandBits)
              .bitwiseAND(lit((1L << bandBits) - 1)).as("key"))
        }: _*)).as("bk"))
      .select(col("simhash"), col("bk.band"), col("bk.key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.simhash") < col("b.simhash"))
      .select(col("a.simhash").as("fp_a"), col("b.simhash").as("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .where(col("hamming") <= maxHamming)
  }

  /** GROUP-DIRECT SimHash clustering — the consumer-shaped alternative to
    * [[simHashNearDupPairs]] → [[connectedComponents]] when the goal is a
    * cluster key per document (retention, splits), not the pair list.
    * The pairs contract must expand a million-copy template page
    * (identical fingerprints, Hamming 0) into ~n²/2 rows; here identical
    * fingerprints are never paired at all: components run over the
    * FINGERPRINT graph (nodes = distinct fingerprints, edges = unequal
    * fingerprints within `maxHamming` from the same banded candidate
    * core), and docs attach to their fingerprint's component by ONE
    * equi-join. Every step is linear in docs + fingerprint pairs — a 10⁴
    * member identical-fingerprint group costs 10⁴ rows end to end, not
    * 5·10⁷ pairs.
    *
    * Output: (doc_id, cluster) for EVERY input document, cluster = the
    * minimum doc_id reachable through the Hamming-≤`maxHamming` relation
    * (identical fingerprints are distance 0, so exact-dup groups always
    * share a cluster); documents with no neighbor within the radius are
    * singletons (cluster = own id). Semantics are exactly
    * `connectedComponents(simHashNearDupPairs(...))` completed with
    * singleton rows — the d13 gate pins the equivalence against a
    * recursive-closure oracle. */
  def simHashClusters(df: DataFrame, id: Column, text: Column,
                      bits: Int = 16, bands: Int = 4, maxHamming: Int = 3,
                      tokenHash: Column => Column = DefaultTokenHash): DataFrame = {
    require(bits % bands == 0, s"bands ($bands) must divide bits ($bits)")
    require(maxHamming < bands,
      s"pigeonhole recall needs maxHamming ($maxHamming) < bands ($bands)")
    val fp = simHashDocs(df, id, text, bits, tokenHash).localCheckpoint(false)
    val fpPairs = bandedFpPairs(fp.select(col("simhash")).distinct(),
      bands, bits / bands, maxHamming)
    // component label per FINGERPRINT (min fingerprint in the component);
    // fingerprints with no in-radius unequal neighbor are absent → their
    // own label via coalesce
    val comp = connectedComponents(fpPairs.select(
        col("fp_a").as("id_a"), col("fp_b").as("id_b")))
      .select(col("doc_id").as("__fp"), col("cluster").as("__fcomp"))
    // consumed twice (the winner aggregate and the final attach) —
    // checkpoint so the fp ⋈ comp join runs once, per the file's
    // multi-consumer convention
    val labeled = fp.join(comp, col("simhash") === col("__fp"), "left")
      .select(col("doc_id"),
        coalesce(col("__fcomp"), col("simhash")).as("__fcomp"))
      .localCheckpoint(false)
    // canonical cluster id = min doc_id in the fingerprint component: one
    // map-side-combined aggregate over the (few) component keys + one join
    val clusterIds = labeled.groupBy("__fcomp")
      .agg(min(col("doc_id")).as("cluster"))
    labeled.join(clusterIds, "__fcomp").select(col("doc_id"), col("cluster"))
  }

  /** Per-doc SimHash over token hashes (default 16 bits): bit i of the
    * fingerprint is the sign of Σ_tokens (2·bit_i(hash) − 1). Expressed as
    * explode + one hash aggregation (map-side combined). `tokenHash` must
    * cover the requested bit width — the default 30-bit [[polyHash]] for
    * bits ≤ 30, [[graft.functions.TextFunctions.wideTokenHash]] (60-bit)
    * for the production-wide configuration (bits above the hash's range
    * would read constant-zero and degenerate their bands into
    * everyone-collides buckets). */
  /** The default token hash (30-bit [[polyHash]]) as a SHARED marker value:
    * [[simHashDocs]] enforces `bits <= 30` on exactly this default — bits
    * 30..59 over a 30-bit hash read constant zero, silently degenerating
    * those bands into everyone-collides buckets, so a wider request must
    * OPT IN with an explicitly wide hash (e.g.
    * [[graft.functions.TextFunctions.wideTokenHash]]). */
  private val DefaultTokenHash: Column => Column = polyHash(_)

  def simHashDocs(df: DataFrame, id: Column, text: Column, bits: Int = 16,
                  tokenHash: Column => Column = DefaultTokenHash): DataFrame = {
    require(bits <= 60, s"simhash bits ($bits) exceeds the 60-bit token hash")
    require(!(tokenHash eq DefaultTokenHash) || bits <= 30,
      s"simhash bits ($bits) exceeds the DEFAULT 30-bit polyHash token " +
        "hash — bits 30..59 would read constant zero (degenerate " +
        "everyone-collides bands); pass an explicitly wide tokenHash " +
        "(TextFunctions.wideTokenHash, 60-bit) to unlock widths above 30")
    val tokenHashes = df.select(id.cast("long").as("doc_id"),
      explode(transform(tokens(text), t => tokenHash(t))).as("h"))
    val bitSums = (0 until bits).map { i =>
      sum(shiftright(col("h"), i) % 2 * 2 - 1).as(s"b$i")
    }
    tokenHashes.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Exact-substring span REMOVAL (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr
    * policy): every token span of `n` tokens whose shingle occurs MORE
    * THAN ONCE in the corpus is cut from the document, and the surviving
    * tokens are rejoined (single spaces — canonical whitespace, the same
    * normalization [[duplicatedSpans]]' hashes already imply). The paper
    * builds a corpus suffix array and keeps each duplicated substring's
    * FIRST occurrence; this removes ALL occurrences — the conservative
    * policy common in reimplementations when span provenance isn't
    * tracked (keep-first needs a global order over corpus positions; at
    * 100 TB the all-occurrences rule is one distributed count, and
    * boilerplate — the dominant real-world case — should lose every
    * copy anyway). The Spark-native duplicate test is the
    * positional-shingle inverted index: a span is duplicated iff its
    * n-token shingle hash has global occurrence > 1 (within-doc repeats
    * count).
    *
    * Plan shape (all linear, no quadratic step): positional hashes are
    * one codegen scan pass; occurrence counting is one map-side-combined
    * shuffle on the hash; covered token positions are an explode of the
    * (few) duplicated span starts into [s, s+n−1] — O(dupSpans·n) rows,
    * never tokens×spans; the kept-token anti-join and the per-doc
    * reassembly each shuffle narrow (doc_id, pos) rows once. A doc that
    * is entirely duplicated text comes back with clean_text = '' — the
    * removal decision is complete, never silently dropped.
    *
    * Output: (doc_id, n_tokens, n_removed, clean_text). */
  def removeDuplicatedSpans(df: DataFrame, id: Column, text: Column,
                            n: Int = 13): DataFrame = {
    require(n >= 1, s"span width must be >= 1, got $n")
    val base = df.select(id.cast("long").as("doc_id"), text.as("text"))
    val spans = base.select(col("doc_id"),
        posexplode(graft.functions.ShingleHash.shingle_hashes_all(col("text"), n)))
      .toDF("doc_id", "pos", "h")
      .localCheckpoint(false) // reused: occurrence counts + the dup join
    val occ = spans.groupBy("h").agg(count(lit(1)).as("occ"))
    // covered token positions: union of [s, s+n-1] over duplicated starts
    val covered = spans.join(occ.where(col("occ") > 1), "h")
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("pos"))
      .distinct()
    val toks = base.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"))
    base.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Corpus-level exact LINE deduplication (the RefinedWeb / MassiveText
    * recipe: boilerplate lines — headers, nav bars, cookie banners —
    * repeat across pages verbatim; keep only the corpus-wide FIRST
    * occurrence of every distinct line, where "first" is the smallest
    * (doc_id, position)). Later occurrences drop, including repeats
    * within one document; documents are reassembled from their surviving
    * lines in original order, NULL when nothing survives (same
    * dropped-page convention as [[Corpus.c4LineFilter]]).
    *
    * `lines` is the caller's array<string> split (newline split for real
    * pages; any deterministic segmentation works). Plan: explode → one
    * map-side-combined `min(struct(doc_id, pos))` per distinct line (no
    * window: a hot boilerplate line combines map-side instead of
    * funneling a partition sort) → semi-join winners back → per-doc
    * reassembly. Two narrow shuffles, both linear in total lines.
    *
    * Output: (doc_id, n_lines, n_kept, clean_text). */
  def dedupLines(df: DataFrame, id: Column, lines: Column): DataFrame = {
    val base = df.select(id.cast("long").as("doc_id"), lines.as("lines"))
    val exploded = base.select(col("doc_id"),
        posexplode(col("lines")).as(Seq("pos", "line")))
      .localCheckpoint(false) // reused: winner agg + winner semi-join
    val winners = exploded.groupBy("line")
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"))
      .select(col("line"), col("w.doc_id").as("doc_id"), col("w.pos").as("pos"))
    val kept = exploded.join(winners, Seq("line", "doc_id", "pos"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), "\n").as("clean_text"))
    base.select(col("doc_id"), size(col("lines")).cast("long").as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("clean_text"))
  }

  /** Token pairs at edit distance EXACTLY 1 — the spelling-variant /
    * typo-unification signal (OCR and web corpora carry per-token
    * mutations that explode the vocabulary; unifying them is a standard
    * normalization pass before counting, BPE, or dedup).
    *
    * The all-pairs `levenshtein` join is O(|V|²) and dead at a 100 TB
    * vocabulary; this uses DELETION-NEIGHBORHOOD blocking (the
    * SymSpell/FastSS family): each token emits itself plus its
    * single-character deletions as join keys, candidates are the
    * equi-join on those keys, and `levenshtein == 1` verifies. The
    * blocking is COMPLETE for distance 1 by construction — a
    * substitution at position i makes both tokens share the delete-at-i
    * key, and an insertion/deletion makes the shorter token itself one
    * of the longer one's deletion keys — so the result provably equals
    * the all-pairs join (which is the oracle at test scale). Per-key
    * bucket occupancy is bounded by alphabet·(len+1)+1, never corpus
    * size; everything else is one equi-join plus a codegen'd verify on
    * candidates only. */
  def editDistanceOnePairs(vocab: DataFrame, tok: Column): DataFrame = {
    val t = vocab.select(tok.cast("string").as("tok"))
      .where(length(col("tok")) >= 1).distinct()
    val keys = t.select(col("tok"), explode(expr(
      """array_union(
        |  transform(sequence(0, length(tok) - 1),
        |    i -> concat(substring(tok, 1, i), substring(tok, i + 2, length(tok)))),
        |  array(tok))""".stripMargin)).as("key"))
    keys.alias("a")
      .join(keys.alias("b"),
        col("a.key") === col("b.key") && col("a.tok") < col("b.tok"))
      .select(col("a.tok").as("tok_a"), col("b.tok").as("tok_b"))
      .distinct()
      .where(levenshtein(col("tok_a"), col("tok_b")) === 1)
  }

  /** Set-similarity self-join with PREFIX FILTERING (the PPJoin family,
    * Bayardo/Xiao et al.) over word-token sets — the PRINCIPLED candidate
    * generator next to [[ngramJaccardPairs]]'s df-cut heuristic: order
    * each doc's tokens rarest-first (global df, then token — one
    * canonical total order both engines derive), and only the first
    * p = s − ⌈t·s⌉ + 1 tokens of a size-s doc can witness a
    * Jaccard ≥ t pair, so the inverted index is built over PREFIXES
    * only. Two candidates must share a prefix token of BOTH sides, and
    * a length filter (t·max ≤ 1000·min) prunes size-incompatible pairs
    * before the exact-intersection join. Thresholds are per-mille
    * integers end to end — ⌈t·s⌉ = (s·tMilli + 999) div 1000 — and the
    * verify is an integer cross-multiplication, so the twin replays
    * every decision bit-for-bit.
    *
    * Scale shape: candidate volume is Σ_token df_prefix(token)² over
    * RARE tokens only (the frequent tokens that explode d2-style
    * indexes never enter a prefix at high t); everything else is
    * map-side-combined counts and equi-joins. Returns
    * (id_a, id_b, jaccard_milli). */
  def prefixJaccardPairs(df: DataFrame, id: Column, text: Column,
                         thresholdMilli: Long = 500): DataFrame = {
    require(thresholdMilli >= 1 && thresholdMilli <= 1000,
      s"thresholdMilli in [1, 1000], got $thresholdMilli")
    val toks = df
      .select(id.cast("long").as("doc_id"),
        explode(array_distinct(tokens(text))).as("tok"))
      .localCheckpoint(false)
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("s"))
    val pref = toks.join(dfreq, "tok")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("df").asc, col("tok").asc)))
      .join(sizes, "doc_id")
      .where(col("rank") <=
        col("s") - expr(s"(s * $thresholdMilli + 999) div 1000") + 1)
      .select("doc_id", "tok", "s")
    // The prefix index is tiny relative to what the bucket self-join
    // expands it into (sf0.1 fixture: 14 k rows → 22 M matches), so AQE
    // coalesces its shuffle output to ONE post-shuffle partition and the
    // whole join+distinct+verify pipeline runs in a single task
    // (measured: a 45 s one-task stage vs 1.2 s at 32-way). Pin the
    // stream side's parallelism with an explicit round-robin repartition
    // — user repartitions with an explicit count are exempt from AQE
    // coalescing, and round-robin also spreads a hot bucket's probe rows
    // uniformly instead of leaving them wherever doc_id hashing put them.
    val prefR = pref.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    // The size-ratio prefilter still runs BEFORE the distinct (it kills
    // pairs the cheapest way), but the distinct itself shuffles only the
    // two ids (r13, guide §2.3 shuffle-fewer-bytes): n_a/n_b are
    // recomputed after the set attach as size(tks) — the token sets ARE
    // the distinct tokens, so size(tks) == s by construction and the
    // emitted jaccard_milli is bit-identical. Halves the bytes of the
    // operator's widest shuffle (the candidate dedup: 22 M rows at the
    // sf0.1 fixture).
    val cand = prefR.as("a").join(pref.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .where(greatest(col("a.s"), col("b.s")) * thresholdMilli <=
        least(col("a.s"), col("b.s")) * 1000L)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // Verify: exact intersection counts. Joining candidates back to the
    // exploded token table shuffles |cand|·s̄ rows (97 M at the sf0.1
    // fixture — the gate's entire 39 s); attaching each side's token SET
    // instead makes the count a map-side merge over the narrow pair
    // frame. The set side is broadcast when its estimate fits 256 MB
    // (the v6b verify pattern); a corpus past the gate shuffles the
    // arrays — |cand| rows, still far below the exploded join's volume.
    // The sets are SORTED once per doc so the per-pair count is the
    // native codegen'd merge walk ([[graft.functions.SetOps]]) instead of
    // the interpreted array_intersect, which builds a hash set per
    // candidate pair (the measured r12 verify hot path). Same integer
    // count — the threshold decision and quotient are bit-identical.
    val sets = Scoring.sizeGatedBroadcast(
      toks.groupBy("doc_id").agg(sort_array(collect_list(col("tok"))).as("tks")),
      256L << 20)
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("tks").as("tks_a")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("tks").as("tks_b")), "id_b")
      .withColumn("n_a", size(col("tks_a")).cast("long"))
      .withColumn("n_b", size(col("tks_b")).cast("long"))
      .withColumn("c", graft.functions.SetOps.sorted_intersect_count(
        col("tks_a"), col("tks_b")))
      .where(col("c") * 1000L >=
        lit(thresholdMilli) * (col("n_a") + col("n_b") - col("c")))
      .select(col("id_a"), col("id_b"),
        expr("(c * 1000) div (n_a + n_b - c)").as("jaccard_milli"))
  }
}
