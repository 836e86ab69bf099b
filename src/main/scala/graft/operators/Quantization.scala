package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the memory-side scale
  * path for similarity search (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 2011). Vectors are split into
  * `numSub` contiguous subspaces; each subspace gets a small codebook
  * (trained with the same deterministic integer-scaled Lloyd rounds as
  * [[Similarity.kmeansCentroids]]); a vector is stored as `numSub` small
  * codes. At 64 float64 dims and 4 subspaces of 256 codes, 512 bytes of
  * vector become 4 bytes of codes — a 128× compression that lets a
  * 100 TB-scale corpus keep its ANN index in executor memory.
  *
  * Scale shape: codebooks are `numSub·k` rows by construction — ALWAYS
  * broadcast. Encoding is one broadcast join + a map-side-combined argmin
  * (no window, no shuffle of the vectors beyond their scan). ADC search
  * never touches corpus vectors: the query side precomputes a per-
  * (query, subspace, code) distance table (bounded: |Q|·numSub·k rows,
  * broadcast), and candidate distances are ONE integer-sum aggregation
  * over the narrow (vec_id, sub, code) code rows.
  *
  * Determinism: squared L2 distances are composed from the codegen'd
  * sequential-fold dot product (`(a·a − 2·(a·b)) + b·b` in that exact
  * order in both engines), rounded to 6 dp before any comparison; argmin
  * ties break on the lowest code id; ADC sums integer micro-units, so
  * aggregation order cannot perturb the result.
  */
object Quantization {

  import Similarity.dot

  private def asDouble(c: Column): Column = c.cast("array<double>")

  private def round6(c: Column): Column = floor(c * 1000000 + 0.5) / 1000000.0

  /** Squared L2 distance from three sequential-fold dot products — the
    * same IEEE op order as the oracle's `(a·a - (2*(a·b))) + b·b`. */
  private def l2sq(a: Column, b: Column): Column =
    (dot(a, a) - lit(2.0) * dot(a, b)) + dot(b, b)

  /** (id, sub, sv): each vector exploded into its `numSub` contiguous
    * sub-vectors of `subDim` dims. `carry` columns (e.g. the IVF cell id)
    * pass through unchanged. */
  def subVectors(df: DataFrame, numSub: Int, subDim: Int,
                 id: String = "vec_id", vec: String = "embedding",
                 outId: String = "vec_id",
                 carry: Seq[String] = Nil): DataFrame = {
    val keep = col(outId) +: carry.map(col)
    df.select((col(id).cast("long").as(outId) +: carry.map(col) :+
        asDouble(col(vec)).as("v")): _*)
      .select((keep :+ explode(array((0 until numSub).map { m =>
        struct(lit(m).as("sub"), slice(col("v"), m * subDim + 1, subDim).as("sv"))
      }: _*)).as("s")): _*)
      .select((keep :+ col("s.sub").as("sub") :+ col("s.sv").as("sv")): _*)
  }

  /** Seed codebooks: for every subspace, the sub-vectors of the `k`
    * lowest-id vectors (code = seeding vector id — the same id-keyed
    * convention as [[Similarity.kmeansCentroids]]). */
  def seedCodebooks(df: DataFrame, numSub: Int, subDim: Int, k: Int,
                    id: String = "vec_id", vec: String = "embedding"): DataFrame =
    subVectors(df.orderBy(col(id)).limit(k), numSub, subDim, id, vec)
      .select(col("sub"), col("vec_id").as("code"), col("sv").as("cw"))

  /** Assign every (id, sub) sub-vector to its nearest codeword: argmin
    * 6-dp-rounded squared L2, code tiebreak — ONE broadcast join plus a
    * map-side-combined `min(struct(dist, code))`, no window. */
  private def assignSv(sv: DataFrame, codebooks: DataFrame,
                       outId: String, carry: Seq[String] = Nil): DataFrame =
    sv.join(broadcast(codebooks), "sub")
      .withColumn("dist", round6(l2sq(col("sv"), col("cw"))))
      .groupBy((col(outId) +: carry.map(col) :+ col("sub")): _*)
      .agg(min(struct(col("dist"), col("code"))).as("m"))
      .select((col(outId) +: carry.map(col)) ++ Seq(col("sub"),
        col("m.code").as("code"), col("m.dist").as("dist")): _*)

  /** PQ-encode a corpus against given codebooks (`(sub, code, cw)` rows):
    * per vector and subspace, the nearest codeword. Returns the narrow
    * (vec_id, sub, code, dist) frame — the compressed representation. */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame,
               numSub: Int, subDim: Int,
               id: String = "vec_id", vec: String = "embedding",
               outId: String = "vec_id"): DataFrame =
    assignSv(subVectors(corpus, numSub, subDim, id, vec, outId),
      codebooks.select(col("sub").cast("int").as("sub"),
        col("code").cast("long").as("code"), asDouble(col("cw")).as("cw")),
      outId)

  /** Train per-subspace codebooks: `iters` deterministic Lloyd rounds over
    * every subspace at once (subspace is just another grouping key, so the
    * k-means of all `numSub` codebooks share each round's two narrow
    * shuffles). Init = [[seedCodebooks]] of the k lowest ids; update =
    * coordinate means on 1e9-scaled integers (exact, order-independent);
    * codewords that lose all members drop out deterministically. */
  def pqTrainCodebooks(corpus: DataFrame, numSub: Int, subDim: Int,
                       k: Int, iters: Int,
                       id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val sv = subVectors(corpus, numSub, subDim, id, vec)
      .localCheckpoint(false)
    // codebooks are bounded (numSub·k rows) AND broadcast every round —
    // the exact shape whose eager localCheckpoint deadlocks against the
    // async broadcast-exchange jobs (see graft.Lineage.cutSmall); the
    // driver-collect cut keeps plans flat with no checkpoint locks
    var cb = graft.Lineage.cutSmall(
      seedCodebooks(corpus, numSub, subDim, k, id, vec))
    for (_ <- 1 to iters) {
      val assign = assignSv(sv, cb, "vec_id").select("vec_id", "sub", "code")
      val sums = assign.join(sv, Seq("vec_id", "sub"))
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("sub", "code", "pos")
        .agg(sum(floor(col("x") * 1000000000L + 0.5)).as("sx"), count(lit(1)).as("n"))
        .withColumn("m", floor(col("sx") / col("n") + 0.5) / 1000000000.0)
      cb = graft.Lineage.cutSmall(sums.groupBy("sub", "code")
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("sub"), col("code"),
          transform(col("pm"), s => s.getField("m")).as("cw")))
    }
    cb
  }

  /** Asymmetric-distance (ADC) top-k search over a PQ-encoded corpus.
    * The query side (bounded) precomputes its distance to every codeword —
    * a |Q|·numSub·k table in integer micro-units, broadcast — and each
    * candidate's approximate distance is the SUM of its codes' table
    * entries: one equi join on (sub, code) against the narrow code rows +
    * one integer-sum aggregation. Corpus vectors are never read past
    * encoding. Ranking compares exact integers (micro-unit sum, then
    * cand id) — no float comparison anywhere.
    *
    * This is the EXHAUSTIVE (textbook) ADC form: every encoded corpus row
    * is scored per query — the right oracle fixture, not the 100 TB path.
    * Production ANN at scale composes the IVF coarse quantizer with ADC:
    * [[ivfPqTopK]] restricts the sum to probed cells. */
  def pqAdcTopK(queries: DataFrame, corpus: DataFrame, codebooks: DataFrame,
                numSub: Int, subDim: Int, k: Int,
                qId: String = "vec_id", qVec: String = "embedding",
                cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val cb = codebooks.select(col("sub").cast("int").as("sub"),
      col("code").cast("long").as("code"), asDouble(col("cw")).as("cw"))
    val codes = pqEncode(corpus, cb, numSub, subDim, cId, cVec, outId = "cand_id")
      .select("cand_id", "sub", "code")
    val dtab = subVectors(queries, numSub, subDim, qId, qVec, outId = "query_id")
      .join(broadcast(cb), "sub")
      .select(col("query_id"), col("sub"), col("code"),
        floor(round6(l2sq(col("sv"), col("cw"))) * 1000000 + 0.5)
          .cast("long").as("d_int"))
    val scored = codes.join(broadcast(dtab), Seq("sub", "code"))
      .where(col("cand_id") =!= col("query_id"))
      .groupBy("query_id", "cand_id")
      .agg(sum(col("d_int")).as("s_int"))
    val w = Window.partitionBy("query_id").orderBy(asc("s_int"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
        (col("s_int").cast("double") / 1000000.0).as("adist"), col("rank"))
  }

  /** Per-dimension bounds for 8-bit scalar quantization (SQ8): `(dim,
    * mn, mx)` in exact integer micro-units. SQ8 is the cheapest vector
    * compression — one byte per dimension against the per-dim linear
    * grid `mn + code·span/255` — and unlike PQ its training is a single
    * min/max aggregation (64 output rows, partial-aggregated map-side),
    * not iterated Lloyd rounds. Exact integer bounds make encode and
    * the decode grid bit-reproducible by the SQL twin. */
  def sqTrain(corpus: DataFrame, id: String = "vec_id",
              vec: String = "embedding"): DataFrame =
    corpus.select(posexplode(asDouble(col(vec))).as(Seq("dim", "v")))
      .select(col("dim"), floor(col("v") * 1000000 + 0.5).cast("long").as("mv"))
      .groupBy("dim").agg(min("mv").as("mn"), max("mv").as("mx"))

  /** SQ8-encode: `(outId, dim, code)` with `code = ((mv−mn)·255) div
    * span` in pure integer arithmetic (a value at the max lands exactly
    * on 255; a degenerate dimension with span 0 encodes as 0). The
    * bounds frame is 1 row per dimension — always broadcast — so encode
    * is a map-only pass over the exploded corpus: the 100 TB shape. */
  def sqEncode(corpus: DataFrame, bounds: DataFrame,
               id: String = "vec_id", vec: String = "embedding",
               outId: String = "vec_id"): DataFrame =
    corpus.select(col(id).cast("long").as(outId),
        posexplode(asDouble(col(vec))).as(Seq("dim", "v")))
      .withColumn("mv", floor(col("v") * 1000000 + 0.5).cast("long"))
      .join(broadcast(bounds), "dim")
      .select(col(outId), col("dim"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(expr("((mv - mn) * 255) div (mx - mn)")).as("code"))

  /** Asymmetric-distance top-k over an SQ8-encoded corpus — structurally
    * [[pqAdcTopK]] with subDim=1 and grid codewords: the (bounded) query
    * side precomputes its squared distance to every grid point — a
    * |Q|·dim·256 integer table, broadcast — and each candidate's
    * approximate distance is the integer SUM of its codes' entries over
    * one `(dim, code)` equi join. The corpus side is only the narrow
    * code rows; no vector column is ever attached, so at scale this is
    * a map-side join + partial aggregation. Grid reconstruction
    * `mn + (code·span)/255.0` and the squared diff keep one fixed IEEE
    * op order, replayed exactly by the twin. */
  def sqAdcTopK(queries: DataFrame, codes: DataFrame, bounds: DataFrame,
                k: Int, qId: String = "vec_id",
                qVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).cast("long").as("query_id"),
        posexplode(asDouble(col(qVec))).as(Seq("dim", "v")))
      .withColumn("q_micro", floor(col("v") * 1000000 + 0.5).cast("long"))
    val dtab = q.join(broadcast(bounds), "dim")
      .select(col("query_id"), col("dim"), col("q_micro"),
        col("mn"), (col("mx") - col("mn")).as("span"))
      .select(col("query_id"), col("dim"),
        explode(sequence(lit(0L), lit(255L))).as("code"),
        col("q_micro"), col("mn"), col("span"))
      .withColumn("r_micro",
        col("mn") + (col("code") * col("span")) / lit(255.0))
      .withColumn("diff",
        (col("q_micro") - col("r_micro")) / lit(1000000.0))
      .select(col("query_id"), col("dim"), col("code"),
        floor(col("diff") * col("diff") * 1000000 + 0.5)
          .cast("long").as("d_int"))
    val scored = codes.select(col("vec_id").as("cand_id"), col("dim"), col("code"))
      .join(broadcast(dtab), Seq("dim", "code"))
      .where(col("cand_id") =!= col("query_id"))
      .groupBy("query_id", "cand_id")
      .agg(sum(col("d_int")).as("s_int"))
    val w = Window.partitionBy("query_id").orderBy(asc("s_int"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
        (col("s_int").cast("double") / 1000000.0).as("adist"), col("rank"))
  }

  /** IVF residuals: each vector minus its nearest centroid, keyed by the
    * cell — `(vec_id, centroid_id, rv)`. This is the frame IVFADC
    * codebooks are seeded/trained on (Jégou et al. 2011 §IV encode the
    * residual, not the raw vector: residual energy is what's left after
    * the coarse quantizer, so the same code budget buys more precision).
    *
    * The coarse assignment defaults to [[Similarity.ivfAssignN]]'s
    * 6-dp-rounded COSINE argmax (the engine-wide deterministic rule that
    * every IVF operator and its oracle twin share), where Jégou et al.
    * assign by L2 — the choice that minimizes residual energy. On
    * normalized embeddings the two agree; on unnormalized data pass
    * `metric = "l2"` for the paper-faithful quantizer (the production
    * default in [[buildIvfPqIndex]]); the cosine default keeps the
    * oracle contract internally exact. */
  def ivfResiduals(corpus: DataFrame, centroids: DataFrame,
                   cId: String = "vec_id", cVec: String = "embedding",
                   kId: String = "vec_id", kVec: String = "embedding",
                   metric: String = "cosine"): DataFrame = {
    val cents = centroids.select(col(kId).cast("long").as("centroid_id"),
      asDouble(col(kVec)).as("cent"))
    corpus.select(col(cId).cast("long").as("vec_id"), asDouble(col(cVec)).as("v"))
      .join(Similarity.ivfAssignN(corpus, centroids, 1, cId, cVec, kId, kVec,
          metric),
        "vec_id")
      .join(broadcast(cents), "centroid_id")
      .select(col("vec_id"), col("centroid_id"),
        zip_with(col("v"), col("cent"), (a, b) => a - b).as("rv"))
  }

  /** Non-exhaustive IVFADC top-k (Jégou et al. 2011 §IV): the composition
    * of the IVF coarse quantizer and ADC that [[pqAdcTopK]] alone lacks.
    * The corpus is PQ-encoded ON RESIDUALS once (`codebooks` come from
    * [[ivfResiduals]] via [[seedCodebooks]]/[[pqTrainCodebooks]]); a query
    * probes its `nProbe` nearest cells, builds a distance table from its
    * PER-CELL residual to every codeword (bounded: |Q|·nProbe·numSub·k
    * rows, broadcast), and ADC sums run ONLY over code rows in probed
    * cells — the (centroid_id, sub, code) join key is what turns v9's
    * exhaustive corpus scan into a per-cell lookup. Per-query work scales
    * with cell occupancy (n/cells · nProbe), not corpus size. At 100 TB,
    * co-partition the code rows by centroid_id so probes are data-local.
    * Same integer-micro-unit determinism as [[pqAdcTopK]]. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                codebooks: DataFrame, numSub: Int, subDim: Int, k: Int,
                nProbe: Int = 1,
                qId: String = "vec_id", qVec: String = "embedding",
                cId: String = "vec_id", cVec: String = "embedding",
                kId: String = "vec_id", kVec: String = "embedding",
                metric: String = "cosine"): DataFrame =
    ivfPqSearch(queries,
      ivfPqEncode(corpus, centroids, codebooks, numSub, subDim,
        cId, cVec, kId, kVec, metric),
      centroids, codebooks, numSub, subDim, k, nProbe, qId, qVec, kId, kVec,
      metric = metric)

  /** The IVFADC build side alone: residual-PQ-encode a corpus against the
    * coarse quantizer — narrow `(cand_id, centroid_id, sub, code)` rows,
    * the persistable CODE INDEX. Encode once, search many:
    * [[writeCodeIndex]] stores it bucketed by cell so [[ivfPqSearch]]
    * probes are data-local. */
  def ivfPqEncode(corpus: DataFrame, centroids: DataFrame,
                  codebooks: DataFrame, numSub: Int, subDim: Int,
                  cId: String = "vec_id", cVec: String = "embedding",
                  kId: String = "vec_id", kVec: String = "embedding",
                  metric: String = "cosine"): DataFrame = {
    val cb = codebooks.select(col("sub").cast("int").as("sub"),
      col("code").cast("long").as("code"), asDouble(col("cw")).as("cw"))
    val resid = ivfResiduals(corpus, centroids, cId, cVec, kId, kVec, metric)
    assignSv(
      subVectors(resid, numSub, subDim, id = "vec_id", vec = "rv",
        outId = "cand_id", carry = Seq("centroid_id")),
      cb, "cand_id", carry = Seq("centroid_id"))
      .select("cand_id", "centroid_id", "sub", "code")
  }

  /** Persist an IVFADC code index BUCKETED BY ITS CELL — the physical
    * layout the probe join wants at 100 TB: rows of one cell land in one
    * bucket file set, so a probed-cell scan reads only those buckets
    * (bucket pruning, `SelectedBucketsCount` in the plan) and the join
    * needs no Exchange on the code side (the distance table is broadcast;
    * the code side streams straight from its buckets). Within-bucket rows
    * sort by (centroid_id, cand_id) for row-group locality. */
  def writeCodeIndex(codes: DataFrame, table: String, numBuckets: Int,
                     path: Option[String] = None): Unit = {
    val w = codes.write.mode("overwrite")
      .bucketBy(numBuckets, "centroid_id").sortBy("centroid_id", "cand_id")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Trained IVFADC index, end to end — the production constructor a
    * reference user would call (the v11 gates fix centroids/codebook
    * seeds only so a SQL oracle can recompute them): Lloyd-train
    * `nCells` coarse centroids (⌈√n⌉ when omitted — the same occupancy
    * rule as the cell-routed dedup paths), residual-encode, Lloyd-train
    * PQ codebooks ON the residuals, encode. Returns (centroids,
    * codebooks, codes) — persist codes via [[writeCodeIndex]] and serve
    * with [[ivfPqSearch]] (pass the SAME `metric`). Training is
    * iteration-bound Lloyd on narrow rows; every per-row stage is the
    * oracle-checked ones composed. Coarse assignment defaults to the
    * paper's L2 quantizer here (residual-energy minimizing on
    * unnormalized data); the v11 gates stay on the engine-wide cosine
    * rule their twins recompute. */
  def buildIvfPqIndex(corpus: DataFrame, numSub: Int, subDim: Int,
                      codebookK: Int = 256, nCells: Int = 0,
                      kmeansIters: Int = 2, pqIters: Int = 2,
                      cId: String = "vec_id", cVec: String = "embedding",
                      metric: String = "l2")
      : (DataFrame, DataFrame, DataFrame) = {
    val k = if (nCells > 0) nCells
      else math.max(1, math.ceil(math.sqrt(corpus.count().toDouble)).toInt)
    val cents = Similarity.kmeansCentroids(corpus, k, kmeansIters, cId, cVec)
      .select(col("centroid_id").as("vec_id"), col("cent").as("embedding"))
      .localCheckpoint(false)
    val resid = ivfResiduals(corpus, cents, cId, cVec, metric = metric)
    val cb = pqTrainCodebooks(resid, numSub, subDim, codebookK, pqIters,
      id = "vec_id", vec = "rv").localCheckpoint(false)
    val codes = ivfPqEncode(corpus, cents, cb, numSub, subDim, cId, cVec,
      metric = metric)
    (cents, cb, codes)
  }

  /** Probe-side IVFADC search over an EXISTING code index (the output of
    * [[ivfPqEncode]], ideally [[writeCodeIndex]]-persisted). The query
    * side is [[ivfPqTopK]]'s: per probed cell, one query residual and one
    * broadcast distance table. `pruneProbedCells` additionally collects
    * the (bounded: ≤ |Q|·nProbe) probed cell ids and pushes an IN filter
    * into the code-index scan — on a bucketed index that is BUCKET
    * PRUNING: per-query work touches only probed buckets, never the full
    * code table. Results are identical either way (the equi join already
    * drops unprobed cells); the filter changes only what gets READ. */
  def ivfPqSearch(queries: DataFrame, codes: DataFrame, centroids: DataFrame,
                  codebooks: DataFrame, numSub: Int, subDim: Int, k: Int,
                  nProbe: Int = 1,
                  qId: String = "vec_id", qVec: String = "embedding",
                  kId: String = "vec_id", kVec: String = "embedding",
                  pruneProbedCells: Boolean = false,
                  metric: String = "cosine"): DataFrame = {
    val cb = codebooks.select(col("sub").cast("int").as("sub"),
      col("code").cast("long").as("code"), asDouble(col("cw")).as("cw"))
    val cents = centroids.select(col(kId).cast("long").as("centroid_id"),
      asDouble(col(kVec)).as("cent"))
    // query side: one residual (and one distance table) per probed cell
    val qResid = queries
      .select(col(qId).cast("long").as("query_id"), asDouble(col(qVec)).as("qv"))
      .join(Similarity.ivfAssignN(queries, centroids, nProbe, qId, qVec, kId,
          kVec, metric)
        .withColumnRenamed("vec_id", "query_id"), "query_id")
      .join(broadcast(cents), "centroid_id")
      .select(col("query_id"), col("centroid_id"),
        zip_with(col("qv"), col("cent"), (a, b) => a - b).as("rv"))
      .localCheckpoint(false) // reused: distance tables + probed-cell ids
    val codeSide =
      if (!pruneProbedCells) codes
      else {
        val cells = qResid.select("centroid_id").distinct()
          .collect().map(_.getLong(0)).toIndexedSeq
        codes.where(col("centroid_id").isin(cells: _*))
      }
    val dtab = subVectors(qResid, numSub, subDim, id = "query_id", vec = "rv",
        outId = "query_id", carry = Seq("centroid_id"))
      .join(broadcast(cb), "sub")
      .select(col("query_id"), col("centroid_id"), col("sub"), col("code"),
        floor(round6(l2sq(col("sv"), col("cw"))) * 1000000 + 0.5)
          .cast("long").as("d_int"))
    val scored = codeSide.join(broadcast(dtab), Seq("centroid_id", "sub", "code"))
      .where(col("cand_id") =!= col("query_id"))
      .groupBy("query_id", "cand_id")
      .agg(sum(col("d_int")).as("s_int"))
    val w = Window.partitionBy("query_id").orderBy(asc("s_int"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
        (col("s_int").cast("double") / 1000000.0).as("adist"), col("rank"))
  }

  /** Binary (sign-bit) quantization: dimension i contributes bit i iff
    * e[i] > 0 — 64 float64 dims become 8 bytes, the narrowest index tier
    * below SQ8 (LLM-embedding search stacks ship exactly this as the
    * first-pass filter; Hamming distance on sign bits tracks cosine on
    * zero-centered embeddings). The code is emitted as two unsigned
    * 32-bit HALVES (hi = bits 32.., lo = bits ..31, the m9 dHash
    * convention) so bit 63 never touches the sign bit of a BIGINT in
    * either engine. One map-side pass, no shuffle. */
  def binaryQuantize(corpus: DataFrame,
                     cId: String = "vec_id", cVec: String = "embedding")
      : DataFrame = {
    // SQL form: the Scala shiftleft() wrapper only takes a literal shift,
    // but the underlying expression shifts by any integer expression
    def half(base: Int): Column = expr(
      s"""aggregate(sequence($base, ${base + 31}), 0L, (acc, i) ->
         |  acc + IF(element_at(cast(`$cVec` as array<double>),
         |             cast(i + 1 as int)) > 0D,
         |           shiftleft(1L, cast(i - $base as int)), 0L))""".stripMargin)
    corpus.select(col(cId).cast("long").as("vec_id"),
      half(32).as("hi"), half(0).as("lo"))
  }

  /** Hamming top-k over binary codes: distance = popcount(q ^ c) summed
    * over the two halves, ties to the lower cand_id. The query side is a
    * broadcast handful against the narrow (vec_id, hi, lo) code scan —
    * the same bounded-cross shape as the brute-force cosine baseline,
    * but over 8-byte codes instead of 512-byte vectors, and the distance
    * is two XOR+popcount ops inside whole-stage codegen. The window
    * prunes through WindowGroupLimit, so only ~k rows per query survive
    * each partition. */
  def hammingTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                  qId: String = "vec_id", qVec: String = "embedding",
                  cId: String = "vec_id", cVec: String = "embedding")
      : DataFrame = {
    val q = binaryQuantize(queries, qId, qVec)
      .select(col("vec_id").as("query_id"), col("hi").as("qhi"),
        col("lo").as("qlo"))
    val c = binaryQuantize(corpus, cId, cVec)
      .select(col("vec_id").as("cand_id"), col("hi"), col("lo"))
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        (expr("bit_count(hi ^ qhi)") + expr("bit_count(lo ^ qlo)"))
          .cast("long").as("hamming"))
    val w = Window.partitionBy("query_id")
      .orderBy(asc("hamming"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("hamming"), col("rank"))
  }

  /** ADC + exact re-rank (the IVFADC+R refinement pattern, Jégou et al.
    * 2011 §V): take a `shortlist` of (query_id, cand_id) pairs from an
    * approximate search run with k = R (R a few × the final k), recompute
    * EXACT squared L2 on just those pairs, and keep the exact top-k. At
    * scale the exact pass touches |Q|·R candidate vectors, not the
    * corpus: the id-pair shortlist broadcasts against the corpus scan
    * (one pass, no shuffle of the vectors), and the query vectors — by
    * construction far fewer — broadcast onto the result. Approximation
    * error then bounds which candidates SURVIVE to the shortlist, never
    * their final order. Same 6-dp micro-unit determinism as the ADC
    * stages. */
  def adcRerank(shortlist: DataFrame, queries: DataFrame, corpus: DataFrame,
                k: Int,
                qId: String = "vec_id", qVec: String = "embedding",
                cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).cast("long").as("query_id"),
      asDouble(col(qVec)).as("qv"))
    val c = corpus.select(col(cId).cast("long").as("cand_id"),
      asDouble(col(cVec)).as("cv"))
    val pairs = shortlist.select("query_id", "cand_id")
    val exact = c.join(broadcast(pairs), "cand_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("cand_id"),
        floor(round6(l2sq(col("qv"), col("cv"))) * 1000000 + 0.5)
          .cast("long").as("d_int"))
    val w = Window.partitionBy("query_id").orderBy(asc("d_int"), asc("cand_id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
        (col("d_int").cast("double") / 1000000.0).as("dist"), col("rank"))
  }
}
