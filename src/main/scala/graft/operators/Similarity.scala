package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * Baseline: exact brute-force cosine top-k (broadcast the query side —
  * right for "few queries vs huge corpus"). Scale path: IVF-style cell
  * partitioning — assign corpus vectors to their nearest centroid once,
  * then probe only matching cells, turning the n×m cross product into a
  * per-cell join. All dot products are codegen'd zip_with/aggregate folds
  * over array<double> — sequential, so bit-identical across engines.
  *
  * Ranking determinism: ranks compare the cosine ROUNDED to 6 decimals
  * with the candidate id as tiebreak, so ordering is stable across engines
  * and across float summation error.
  */
object Similarity {

  /** Codegen'd sequential-fold dot product (see
    * [[graft.functions.VectorOps]] — the HOF composition it replaces is
    * interpreted and allocates per row; results are bit-identical). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k: for each query vector, the k nearest corpus vectors by
    * cosine. Query side is broadcast (bounded); corpus side streams.
    * Norms are computed ONCE per vector before the pair join — per-pair
    * `cosine()` would redo both sqrt folds for every candidate pair (the
    * result is bit-identical: same IEEE ops on the same inputs). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "vec_id", qVec: String = "embedding",
                     cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).cast("long").as("query_id"),
      asDouble(col(qVec)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(cId).cast("long").as("cand_id"),
      asDouble(col(cVec)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("cos",
        floor((dot(col("qv"), col("cv")) / (col("qn") * col("cn"))) * 1000000 + 0.5) / 1000000.0)
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rank"))
  }

  /** Exact squared-L2 top-k — the ground-truth twin of the ANN paths
    * ([[graft.operators.Quantization.ivfPqTopK]] ranks by approximated
    * squared L2): for each query, the k nearest corpus vectors by
    * 6-dp-rounded squared L2 (the engine's fixed IEEE fold order
    * `(q·q − 2(q·c)) + c·c`), candidate-id tiebreak, self excluded.
    * Same broadcast-query shape as [[bruteForceTopK]]. */
  def exactL2TopK(queries: DataFrame, corpus: DataFrame, k: Int,
                  qId: String = "vec_id", qVec: String = "embedding",
                  cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).cast("long").as("query_id"),
      asDouble(col(qVec)).as("qv"))
      .withColumn("qq", dot(col("qv"), col("qv")))
    val c = corpus.select(col(cId).cast("long").as("cand_id"),
      asDouble(col(cVec)).as("cv"))
      .withColumn("cc", dot(col("cv"), col("cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("dist",
        floor(((col("qq") - (lit(2.0) * dot(col("qv"), col("cv")))) + col("cc"))
          * 1000000 + 0.5) / 1000000.0)
    val w = Window.partitionBy("query_id").orderBy(asc("dist"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("dist"), col("rank"))
  }

  /** Recall@k of an approximate top-k against the exact one — THE quality
    * dial of every ANN deployment (nProbe / codebook size / cell count
    * trade compute for exactly this number; without measuring it an
    * "accelerated" index is untrustworthy). Both inputs are
    * (query_id, cand_id, …) frames, e.g.
    * [[graft.operators.Quantization.ivfPqTopK]] vs [[exactL2TopK]].
    * Per query: hits = |approx ∩ exact| (id-set intersection — rank
    * agreement is deliberately NOT required), recall = hits / k. Queries
    * the approximate side missed entirely still appear (recall 0): the
    * exact side drives. Both sides are ≤ |Q|·k rows, so every step is a
    * bounded narrow join — corpus size never enters. */
  def annRecallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = approx.select(col("query_id").cast("long").as("query_id"),
      col("cand_id").cast("long").as("cand_id"))
    val e = exact.select(col("query_id").cast("long").as("query_id"),
      col("cand_id").cast("long").as("cand_id"))
    val hits = e.join(a, Seq("query_id", "cand_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    e.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (floor((coalesce(col("n_hits"), lit(0L)).cast("double") / k) * 1000000
          + 0.5) / 1000000.0).as("recall"))
  }

  /** L2-normalization map — the unit-sphere projection cosine pipelines
    * assume (after it, cosine == dot product and every IVF/LSH/PQ stage
    * drops its per-vector norm term). Map-only, zero shuffle, codegen'd
    * sequential-fold norm; outputs round to 1e-6 (the engine-wide
    * fixed-point rule) so any engine reproduces the bytes. Zero-norm
    * vectors yield NULL — loud, never a fabricated direction.
    *
    * Staged as two projections (the [[graft.operators.Dedup.minHashDocs]]
    * rule): a `nrm` expression referenced inside the `transform` lambda
    * gets INLINED per element — the O(d) norm fold re-ran d times per
    * vector, O(d²), measured 25.8 s for 60k×64 vectors at the 30×
    * replica vs ~1 s for the comparable v13 map. With the norm in its
    * own projection the lambda divides by a bound column. */
  def l2Normalize(df: DataFrame, id: Column, embedding: Column): DataFrame =
    df.select(id.cast("long").as("vec_id"), embedding.as("__e"),
        norm(embedding).as("__nrm"))
      .select(col("vec_id"),
        when(col("__nrm") > 0, transform(col("__e"),
          x => floor(x / col("__nrm") * 1000000 + 0.5) / 1000000.0))
          .as("unit"))

  /** Per-dimension corpus statistics of an embedding column in 1e-6
    * fixed point — the feature-scaling pass (mean-center / standardize)
    * every downstream quantizer and ANN index assumes, and a drift
    * check between embedding batches. Values are scaled to integer
    * micro-units BEFORE aggregation, so the sums are exact and
    * partition-order-independent (the repo-wide fixed-point rule: a
    * float Σ would hash differently per run); the only float is the
    * final mean division.
    *
    * Scale shape: posexplode multiplies rows ×dims, but partial
    * (map-side) aggregation collapses each partition to ≤ dims rows
    * before the shuffle — the exchange moves dims·partitions tiny rows
    * regardless of corpus size. The stats frame (dims rows) then
    * broadcasts into whatever normalization map needs it. */
  def dimStats(df: DataFrame, embedding: Column): DataFrame =
    df.select(posexplode(embedding).as(Seq("dim", "v")))
      .withColumn("mv", floor(col("v") * 1000000 + 0.5).cast("long"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("mv").as("sum_micro"),
        sum(col("mv") * col("mv")).as("sumsq_micro"))
      .withColumn("mean_micro", col("sum_micro").cast("double") / col("n"))

  /** Random projection to `outDim` dimensions (Johnson–Lindenstrauss;
    * Achlioptas 2003 showed simple non-Gaussian matrices — uniform
    * signs/entries — preserve pairwise distances just as well) — the
    * dimensionality-reduction step that runs BEFORE the shuffle-bearing
    * ANN stages: a wide embedding column (say 1536 dims) projected to
    * `outDim` shrinks every downstream exchange, index, and verify by
    * dim/outDim while approximately preserving distances.
    *
    * y_j = Σ_d v_d · p(j, d) with the engine's integer-exact LCG
    * constants ([[planeComponent]], the same closed form the LSH twins
    * reproduce in SQL), each component 6-dp-rounded. The projection
    * matrix never materializes per row — `outDim` literal-array dot
    * folds, all inside whole-stage codegen; map-only, zero shuffle.
    * Output: (vec_id, proj: array<double>). */
  def randomProject(df: DataFrame, dim: Int, outDim: Int,
                    id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(outDim >= 1, s"outDim must be >= 1, got $outDim")
    val v = df.select(col(id).cast("long").as("vec_id"),
      asDouble(col(vec)).as("v"))
    val comps = (0 until outDim).map { j =>
      val plane = array((0 until dim).map(d => lit(planeComponent(j, d, dim))): _*)
      floor(dot(col("v"), plane) * 1000000 + 0.5) / 1000000.0
    }
    v.select(col("vec_id"), array(comps: _*).as("proj"))
  }

  /** The 6-dp-rounded assignment score: cosine (argMAX, the engine-wide
    * default every oracle twin recomputes) or negated squared L2 (so the
    * same max-struct argmax yields the argMIN-distance cell — Jégou et
    * al. 2011's coarse quantizer, the residual-energy-minimizing choice
    * for IVFADC on unnormalized data; on normalized vectors the two
    * rankings agree). L2 uses the engine's fixed IEEE order
    * `(v·v − 2(v·c)) + c·c`. */
  private def assignScore(metric: String): Column = metric match {
    case "cosine" =>
      floor((dot(col("v"), col("cent")) / (col("vn") * col("kn"))) * 1000000 + 0.5) / 1000000.0
    case "l2" =>
      -(floor(((dot(col("v"), col("v")) - (lit(2.0) * dot(col("v"), col("cent"))))
          + dot(col("cent"), col("cent"))) * 1000000 + 0.5) / 1000000.0)
    case m => throw new IllegalArgumentException(
      s"""metric must be "cosine" or "l2", got "$m"""")
  }

  /** IVF cell assignment: nearest centroid per vector (argmax 6-dp-rounded
    * [[assignScore]], centroid-id tiebreak). Centroids are broadcast; the
    * argmax is ONE map-side-combined `max(struct(score, -id))` aggregation
    * — no sort, no window: a row_number window would shuffle AND sort all
    * n·k scored rows, the dominant cost of k-means/assignment at n·k in
    * the millions. This is the build side of the scale path. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
                cId: String = "vec_id", cVec: String = "embedding",
                kId: String = "vec_id", kVec: String = "embedding",
                metric: String = "cosine"): DataFrame = {
    val c = corpus.select(col(cId).cast("long").as("vec_id"),
      asDouble(col(cVec)).as("v"))
      .withColumn("vn", norm(col("v")))
    val cents = centroids.select(col(kId).cast("long").as("centroid_id"),
      asDouble(col(kVec)).as("cent"))
      .withColumn("kn", norm(col("cent")))
    // struct orders lexicographically: highest score first, then lowest
    // centroid_id (via the negated field); ties are impossible beyond that
    // (centroid ids are distinct), so the argmax is fully deterministic.
    c.join(broadcast(cents))
      .withColumn("cos", assignScore(metric))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("centroid_id")).as("neg"),
        col("centroid_id").as("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("centroid_id"),
        col("m.cos").as("centroid_cos"))
  }

  /** Multi-probe cell assignment: the nProbe nearest centroids per vector
    * (nProbe = 1 is the build-side assignment; queries probe more cells to
    * trade compute for recall). nProbe = 1 routes through the windowless
    * [[ivfAssign]] aggregation; larger probes genuinely need a per-vector
    * top-k and use the rank window. */
  def ivfAssignN(vectors: DataFrame, centroids: DataFrame, nProbe: Int,
                 vId: String = "vec_id", vVec: String = "embedding",
                 kId: String = "vec_id", kVec: String = "embedding",
                 metric: String = "cosine"): DataFrame = {
    if (nProbe == 1)
      return ivfAssign(vectors, centroids, vId, vVec, kId, kVec, metric)
        .select("vec_id", "centroid_id")
    val v = vectors.select(col(vId).cast("long").as("vec_id"),
      asDouble(col(vVec)).as("v"))
      .withColumn("vn", norm(col("v")))
    val cents = centroids.select(col(kId).cast("long").as("centroid_id"),
      asDouble(col(kVec)).as("cent"))
      .withColumn("kn", norm(col("cent")))
    val scored = v.join(broadcast(cents))
      .withColumn("cos", assignScore(metric))
    val w = Window.partitionBy("vec_id").orderBy(desc("cos"), asc("centroid_id"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= nProbe)
      .select(col("vec_id"), col("centroid_id"))
  }

  /** IVF top-k search — the ANN scale path: corpus vectors are assigned to
    * their nearest centroid once; each query probes its nProbe nearest
    * cells and ranks only the vectors in those cells. The n×m cross
    * product becomes per-cell joins; at 100 TB, co-partition the corpus by
    * centroid_id so cells are data-local. */
  def ivfSearch(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                k: Int, nProbe: Int = 1,
                qId: String = "vec_id", qVec: String = "embedding",
                cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val cAssign = ivfAssignN(corpus, centroids, 1, cId, cVec)
      .withColumnRenamed("vec_id", "cand_id")
    val qAssign = ivfAssignN(queries, centroids, nProbe, qId, qVec)
      .withColumnRenamed("vec_id", "query_id")
    val qv = queries.select(col(qId).cast("long").as("query_id"),
      asDouble(col(qVec)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val cv = corpus.select(col(cId).cast("long").as("cand_id"),
      asDouble(col(cVec)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = qAssign.join(cAssign, "centroid_id")
      .where(col("cand_id") =!= col("query_id"))
      .select("query_id", "cand_id").distinct() // a cand in 2 probed cells counts once
      .join(broadcast(qv), "query_id")
      .join(cv, "cand_id")
      .withColumn("cos",
        floor((dot(col("qv"), col("cv")) / (col("qn") * col("cn"))) * 1000000 + 0.5) / 1000000.0)
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rank"))
  }

  /** Deterministic distributed Lloyd k-means — the centroid TRAINING step
    * for the IVF index ([[ivfAssign]]/[[ivfSearch]] consume its output).
    * Engine-stable by construction, so it has an exact SQL twin:
    *   - init: the k lowest-id vectors seed the centroids (ids kept);
    *   - assign: argmax 6-dp-rounded cosine, centroid-id tiebreak (the
    *     identical rule [[ivfAssignN]] applies);
    *   - update: coordinate-wise mean on 1e9-scaled integers — the sum is
    *     exact and order-independent (all terms integral, < 2^53), and
    *     floor(sx/n + 0.5)/1e9 is one deterministic IEEE division.
    * Per iteration: one broadcast of the k×dim centroids + one narrow
    * (centroid_id, pos, x) shuffle — no cross product; clusters that lose
    * every member drop out (k shrinks), deterministically. The tiny
    * centroid frame is checkpointed each round so plans stay flat. */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int,
                      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    // one materialization of the narrow (vec_id, v) projection — each Lloyd
    // round reads it twice (assignment + the mean re-attach join)
    val v = corpus.select(col(cId).cast("long").as("vec_id"),
      asDouble(col(cVec)).as("v"))
      .localCheckpoint(false)
    // centroids are bounded (k rows) AND broadcast in every assignment —
    // cut their lineage by driver collect, not localCheckpoint, to stay
    // clear of the checkpoint/broadcast lock inversion (graft.Lineage)
    var cents = graft.Lineage.cutSmall(v.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("centroid_id"), col("v").as("cent")))
    for (_ <- 1 to iters) {
      val assign = ivfAssignN(v, cents, 1, "vec_id", "v", "centroid_id", "cent")
      val sums = assign.join(v, "vec_id")
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos")
        .agg(sum(floor(col("x") * 1000000000L + 0.5)).as("sx"), count(lit(1)).as("n"))
        .withColumn("m", floor(col("sx") / col("n") + 0.5) / 1000000000.0)
      cents = graft.Lineage.cutSmall(sums.groupBy("centroid_id")
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id"),
          transform(col("pm"), s => s.getField("m")).as("cent")))
    }
    cents
  }

  /** Deterministic pseudo-random hyperplane component for bit j, dim d:
    * an LCG-mixed integer mapped to [-1, 1] in thousandths. Integer-exact,
    * so any engine reproduces the planes bit-for-bit. */
  def planeComponent(j: Int, d: Int, dim: Int): Double =
    (((1103515245L * (j.toLong * dim + d) + 12345L) % 2147483648L) % 2001L - 1000L) / 1000.0

  /** Random-hyperplane LSH near-dup pairs — the LSH-bucketed scale path
    * (vs [[ivfAssign]] cells): per band, an 8-bit signature of
    * sign(v·plane) bits; vectors sharing any band signature become
    * candidates; candidates are verified with exact cosine >= threshold.
    * One shuffle on (band, signature) — never a cross product.
    *
    * A FIXED `bitsPerBand` saturates like a fixed cell count: bucket
    * occupancy grows with n and within-bucket candidates with n², so a
    * width chosen for a small corpus becomes quadratic at scale (the
    * v6 fixture's 4-bit bands held ~12.5k vectors each on the 100×
    * replica — ~5·10^9 candidate pairs). Derive the width from the
    * corpus size with [[lshNearDupPairsScaled]] instead.
    *
    * `bucketCap` > 0 additionally bounds the work of any SINGLE task: a
    * width rule fixes MEAN occupancy, not skew — one hot (band, sig)
    * bucket (2,092 vectors observed on the 100× replica at threshold
    * 0.35 ⇒ ~2.2M candidates in ONE task) still funnels. Buckets above
    * the cap are grid-salted: members get a balanced salt r = rn mod s
    * (s = ⌈occ/cap⌉, rn a row_number within the bucket, so cells differ
    * by ≤ 1 row), each side replicates s× against the OTHER side's salt
    * axis, and the join key becomes (band, sig, salt_a, salt_b) — pair
    * (a, b) matches in exactly the (salt_a, salt_b) cell, so the
    * candidate SET is identical to the unsalted join while no join key
    * carries more than ⌈occ/s⌉² ≤ cap² candidates. Cold buckets keep
    * s = 1 (no replication). The exact-cosine verify is unchanged, so
    * recall is exactly preserved. Cost: one extra window pass over the
    * narrow (vid, band, sig) rows to derive (occ, rn). */
  def lshNearDupPairs(df: DataFrame, threshold: Double, dim: Int,
                      bands: Int = 2, bitsPerBand: Int = 8,
                      id: String = "vec_id", vec: String = "embedding",
                      bucketCap: Long = 0L,
                      hammingMargin: Double = Double.NaN): DataFrame = {
    val v = df.select(col(id).cast("long").as("vid"), asDouble(col(vec)).as("v"))
    val bandSigs = (0 until bands).map { b =>
      val sig = (0 until bitsPerBand).map { r =>
        val j = b * bitsPerBand + r
        val plane = array((0 until dim).map(d => lit(planeComponent(j, d, dim))): _*)
        when(dot(col("v"), plane) > 0, lit(1L << r)).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(b).as("band"), sig.as("sig"))
    }
    // Narrow band rows: (vid, band, sig) only; vectors re-attach to the
    // (much smaller) distinct candidate-pair set for the exact verify.
    // Lazy localCheckpoint: the 16 plane dot products per vector run once
    // for both sides of the self-join.
    val banded = v.select(col("vid"), explode(array(bandSigs: _*)).as("bs"))
      .select(col("vid"), col("bs.band"), col("bs.sig"))
      .localCheckpoint(false)
    val rawCand =
      if (bucketCap > 0L)
        saltedBandPairs(banded, bucketCap).select("id_a", "id_b")
      else banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.vid") < col("b.vid"))
        .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"))
    // Sketch-verify cascade (`hammingMargin` set): before the expensive
    // exact verify attaches two dim-length arrays per candidate, screen
    // each pair by the Hamming distance between the ALREADY-COMPUTED
    // concatenated band signatures — h/B estimates the angle (random-
    // hyperplane identity: P[bit differs] = θ/π), so pairs whose
    // estimated cosine cos(π·h/B) falls below `threshold − margin` are
    // rejected using two narrow long columns instead of 2·dim doubles.
    // The r8 100× probe measured 96% of the 113M candidates coming from
    // the fixture's quadratic random-similarity tail (cos ≈ 0.3) — the
    // screen drops most of them for the cost of a size-gated broadcast
    // join on (vid → 56-bit signature). The cut is DETERMINISTIC
    // (integer Hamming bound, derived identically by the SQL twin), so
    // oracle hashes still match; recall loss is pairs whose sketch
    // underestimates them — P ≈ Φ(−margin·B/π·σ⁻¹), ~1e-3 at B=56,
    // margin=0.2. NaN (default) disables; bands·bitsPerBand must fit a
    // long, else the screen is skipped.
    val screened =
      if (hammingMargin.isNaN || bands * bitsPerBand > 62) rawCand
      else {
        val bTot = bands * bitsPerBand
        val hmax = math.floor(bTot * math.acos(math.max(-1.0,
          math.min(1.0, threshold - hammingMargin))) / math.Pi).toLong
        val sigbits = Scoring.sizeGatedBroadcast(
          banded.groupBy("vid").agg(
            sum(expr(s"shiftleft(sig, cast(band * $bitsPerBand as int))"))
              .as("sb")))
        rawCand
          .join(sigbits.select(col("vid").as("id_a"), col("sb").as("ba")), "id_a")
          .join(sigbits.select(col("vid").as("id_b"), col("sb").as("bb")), "id_b")
          .where(expr(s"bit_count(ba ^ bb) <= ${hmax}L"))
          .select("id_a", "id_b")
      }
    val cand = screened.distinct()
    // The exact verify attaches two dim-length arrays per candidate; at
    // the 100× replica that was a 106M-row × ~0.5 KB sort-merge shuffle
    // (the vector side's ~100 MB estimate just misses the 64 MB default
    // gate) — ~200 s of the 284 s total. Gate the vector side at 256 MB
    // instead: broadcasting ≤ 256 MB of vectors turns the verify into a
    // map-only pass over the narrow pair frame; a truly large corpus
    // (≥ millions of vectors) still exceeds the gate and falls back to
    // the shuffle, which is then the honest cost.
    val vn = Scoring.sizeGatedBroadcast(
      v.withColumn("n", norm(col("v"))), 256L << 20)
    cand
      .join(vn.select(col("vid").as("id_a"), col("v").as("va"), col("n").as("na")), "id_a")
      .join(vn.select(col("vid").as("id_b"), col("v").as("vb"), col("n").as("nb")), "id_b")
      .withColumn("cos",
        floor((dot(col("va"), col("vb")) / (col("na") * col("nb"))) * 1000000 + 0.5) / 1000000.0)
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Grid-salted within-bucket pair generation over (vid, band, sig)
    * rows — see [[lshNearDupPairs]]'s `bucketCap` doc for the invariants.
    * Both the occupancy and the balanced intra-bucket row number come out
    * of ONE window pass; the salted frame is lazily checkpointed so the
    * window job runs once for both join sides. Returns the salted join
    * key alongside the pair so specs can bound per-key candidate counts;
    * [[lshNearDupPairs]] keeps only (id_a, id_b). */
  private[graft] def saltedBandPairs(banded: DataFrame, cap: Long): DataFrame = {
    val byBucket = Window.partitionBy("band", "sig")
    val salted = banded
      .withColumn("occ", count(lit(1)).over(byBucket))
      .withColumn("rn", row_number().over(byBucket.orderBy("vid")))
      .withColumn("s", ceil(col("occ") / lit(cap.toDouble)).cast("long"))
      .withColumn("salt", (col("rn") - 1) % col("s"))
      .select(col("vid"), col("band"), col("sig"), col("s"), col("salt"))
      .localCheckpoint(false)
    // pair (a, b) matches in exactly one cell: B's explode hits A's salt
    // on the first axis, A's explode hits B's salt on the second
    val a = salted.select(col("vid"), col("band"), col("sig"),
      col("salt").as("sa"), explode(sequence(lit(0L), col("s") - 1)).as("sb"))
    val b = salted.select(col("vid"), col("band"), col("sig"),
      explode(sequence(lit(0L), col("s") - 1)).as("sa"), col("salt").as("sb"))
    a.as("a").join(b.as("b"),
      col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.sa") === col("b.sa") && col("a.sb") === col("b.sb") &&
        col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        col("a.band").as("band"), col("a.sig").as("sig"),
        col("a.sa").as("sa"), col("a.sb").as("sb"))
  }

  /** Scale-adaptive [[lshNearDupPairs]] — the LSH analog of
    * [[scaledCellNearDupPairs]]'s k=⌈√n⌉ rule: the per-band signature
    * width is derived from the corpus size so expected bucket occupancy
    * stays at `targetOccupancy` at ANY scale, keeping candidate volume
    * ~bands·n·occupancy/2 (linear in n) where a fixed width is n²/2^bits.
    * `bits` is the smallest b in [1, maxBits] with n ≤ targetOccupancy·2^b
    * — an integer-exact rule (no floating log2 whose rounding an oracle
    * could disagree with), so any engine derives the same width from the
    * same count.
    *
    * `precomputedN` lets a caller that already knows the corpus size skip
    * the count job entirely (at 100 TB even the metadata-only count-star
    * is a full-footer pass); absent, ONE zero-column count runs first.
    * The width rule fixes MEAN occupancy only, so hot buckets from a
    * skewed corpus are additionally grid-salted at `bucketCap` (see
    * [[lshNearDupPairs]]) — on by default here because this is the scale
    * path. */
  def lshNearDupPairsScaled(df: DataFrame, threshold: Double, dim: Int,
                            bands: Int = 4, maxBits: Int = 24,
                            targetOccupancy: Long = 16L,
                            id: String = "vec_id", vec: String = "embedding",
                            precomputedN: Option[Long] = None,
                            bucketCap: Long = 64L,
                            hammingMargin: Double = Double.NaN): DataFrame = {
    require(maxBits >= 1 && maxBits <= 62,
      s"maxBits must be in [1, 62], got $maxBits")
    require(targetOccupancy >= 1,
      s"targetOccupancy must be >= 1, got $targetOccupancy")
    val n = precomputedN.getOrElse(df.count())
    // guard the shift: if targetOccupancy·2^b overflows Long it exceeds
    // Long.MaxValue >= n, so the mathematical "n <= t·2^b" is TRUE there
    val bits = (1 to maxBits).find(b =>
        targetOccupancy > (Long.MaxValue >> b) || n <= (targetOccupancy << b))
      .getOrElse(maxBits)
    lshNearDupPairs(df, threshold, dim, bands, bits, id, vec, bucketCap,
      hammingMargin)
  }

  /** Cell-routed near-dup — the scale path for [[cosineNearDupPairs]]:
    * every vector is assigned to its `nProbe` nearest IVF cells
    * ([[ivfAssignN]], broadcast centroids) and the exact pair check runs
    * WITHIN cells only — an equi self-join on centroid_id over narrow
    * (vec_id, centroid_id) rows, never a cross product or nested loop.
    * Vectors re-attach to the (much smaller) distinct candidate set for
    * the exact cosine verify, exactly like the LSH path. nProbe > 1
    * recovers near-boundary pairs at proportional cost. */
  def cellRoutedNearDupPairs(df: DataFrame, centroids: DataFrame,
                             threshold: Double, nProbe: Int = 1,
                             id: String = "vec_id", vec: String = "embedding",
                             kId: String = "vec_id", kVec: String = "embedding"): DataFrame = {
    // one assignment pass feeds both sides of the candidate self-join
    // (lazy localCheckpoint: narrow (vec_id, centroid_id) rows, GC-scoped)
    val assign = ivfAssignN(df, centroids, nProbe, id, vec, kId, kVec)
      .localCheckpoint(false)
    // Pair-generation parallelism must not be capped by the cell count or
    // by upstream partition collapse: when the narrow build side
    // broadcasts, the PROBE side's partitioning IS the stage parallelism —
    // the argmax aggregation upstream AQE-coalesces to one partition at
    // bench scale, which funneled every within-cell pair of a 30× run
    // through a single 26-minute hash-dedup task. Round-robin repartition
    // the probe side to the session default; if the planner picks a
    // shuffled join instead, the exchange is re-planned and this is a
    // cheap extra shuffle of narrow rows.
    val probe = assign.repartition(
      assign.sparkSession.sessionState.conf.numShufflePartitions)
    val cand = probe.as("a")
      .join(assign.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val v = df.select(col(id).cast("long").as("vid"), asDouble(col(vec)).as("v"))
      .withColumn("n", norm(col("v")))
    cand
      .join(v.select(col("vid").as("id_a"), col("v").as("va"), col("n").as("na")), "id_a")
      .join(v.select(col("vid").as("id_b"), col("v").as("vb"), col("n").as("nb")), "id_b")
      .withColumn("cos",
        floor((dot(col("va"), col("vb")) / (col("na") * col("nb"))) * 1000000 + 0.5) / 1000000.0)
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** [[cellRoutedNearDupPairs]] with TRAINED, N-SCALED cells — the
    * production parameterization: k = ceil(√n) Lloyd-trained centroids
    * keep expected cell membership ≈ √n, so total within-cell verify work
    * grows ~n·√n instead of n²/k with a fixed cell count (the measured
    * failure mode of a static-k index at 10× data — see BENCH_SCALING.md).
    * One count, one bounded k-means, then the usual cell-routed join.
    * `precomputedN` skips the count job when the caller already knows the
    * corpus size (same contract as [[lshNearDupPairsScaled]] — at 100 TB
    * even the metadata-only count-star is a full-footer pass). */
  def scaledCellNearDupPairs(df: DataFrame, threshold: Double,
                             nProbe: Int = 1, kmeansIters: Int = 2,
                             id: String = "vec_id", vec: String = "embedding",
                             precomputedN: Option[Long] = None): DataFrame = {
    val n = precomputedN.getOrElse(df.count())
    val k = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    val cents = kmeansCentroids(df, k, kmeansIters, id, vec)
    cellRoutedNearDupPairs(df, cents, threshold, nProbe, id, vec,
      "centroid_id", "cent")
  }

  /** Embedding near-duplicate pairs: all (a < b) with cosine >= threshold.
    * Exact all-pairs BASELINE (O(n²) nested-loop join) — for any corpus
    * that doesn't fit one node, use [[cellRoutedNearDupPairs]] (IVF cells)
    * or [[lshNearDupPairs]] (hyperplane buckets) instead. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
                         id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val v = df.select(col(id).cast("long").as("vid"), asDouble(col(vec)).as("v"))
      .withColumn("n", norm(col("v")))
    v.as("a").join(v.as("b"), col("a.vid") < col("b.vid"))
      .withColumn("cos",
        floor((dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n"))) * 1000000 + 0.5) / 1000000.0)
      .where(col("cos") >= threshold)
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"), col("cos"))
  }

  /** Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023,
    * arXiv:2303.09540): cluster embeddings with k = ceil(√n) Lloyd-trained
    * centroids, form near-dup pairs WITHIN cells only (cosine >=
    * threshold), take connected components of the pair graph, and per
    * component KEEP the member farthest from its cell centroid (lowest
    * centroid cosine — the paper's "keep the most atypical example" rule;
    * doc-id tiebreak), dropping the rest. Unpaired vectors are singleton
    * keeps, so the output is a complete per-vector decision:
    * (vec_id, cluster, centroid_cos, kept).
    *
    * Scale shape: one k-means (bounded iterations), ONE assignment pass
    * feeding both the keep rule and pair generation, within-cell equi
    * self-join on narrow rows (never all-pairs — each edge lives inside
    * one cell, so components never span cells and the ~n^1.5 work bound of
    * the √n-cell routing holds; see BENCH_SCALING.md), then the O(log d)
    * pointer-doubling components and a map-side min(struct) winner per
    * component — no windows anywhere. `precomputedN` skips the count job
    * when the caller already knows the corpus size (same contract as
    * [[lshNearDupPairsScaled]]). */
  def semanticDedup(df: DataFrame, threshold: Double, kmeansIters: Int = 2,
                    id: String = "vec_id", vec: String = "embedding",
                    precomputedN: Option[Long] = None): DataFrame = {
    val n = precomputedN.getOrElse(df.count())
    val k = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    val cents = kmeansCentroids(df, k, kmeansIters, id, vec)
    // one assignment pass (argmax aggregation, centroids broadcast) reused
    // by the pair join's BOTH sides and the keep rule's centroid_cos
    val assign = ivfAssign(df, cents, id, vec, "centroid_id", "cent")
      .localCheckpoint(false)
    // pair-generation parallelism: same probe-side repartition rationale
    // as cellRoutedNearDupPairs — the argmax upstream AQE-coalesces small,
    // and with the narrow build side broadcast the probe partitioning IS
    // the stage parallelism
    val probe = assign.repartition(
      assign.sparkSession.sessionState.conf.numShufflePartitions)
    val cand = probe.as("a")
      .join(assign.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    val v = df.select(col(id).cast("long").as("vid"), asDouble(col(vec)).as("v"))
      .withColumn("n", norm(col("v")))
    val pairs = cand
      .join(v.select(col("vid").as("id_a"), col("v").as("va"), col("n").as("na")), "id_a")
      .join(v.select(col("vid").as("id_b"), col("v").as("vb"), col("n").as("nb")), "id_b")
      .withColumn("cos",
        floor((dot(col("va"), col("vb")) / (col("na") * col("nb"))) * 1000000 + 0.5) / 1000000.0)
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))
    val comp = Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("vec_id"), col("cluster"))
    // lazy localCheckpoint: `labeled` feeds BOTH the winner aggregation
    // and the verdict join — without it the assign ⟕ components subtree
    // computes twice (r13 plan audit: duplicated subtrees under v10)
    val labeled = assign.join(comp, Seq("vec_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("vec_id")))
      .localCheckpoint(false)
    // winner = min (centroid_cos, vec_id) — farthest-from-centroid, id tie
    val winners = labeled.groupBy("cluster")
      .agg(min(struct(col("centroid_cos"), col("vec_id").as("kid"))).as("m"))
      .select(col("cluster"), col("m.kid").as("keep_id"))
    labeled.join(winners, "cluster")
      .select(col("vec_id"), col("cluster"), col("centroid_cos"),
        (col("vec_id") === col("keep_id")).as("kept"))
  }
}
