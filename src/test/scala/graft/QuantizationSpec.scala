package graft

import graft.operators.Quantization
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {

  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  "Quantization.subVectors" should "split vectors into contiguous subspaces" in {
    val df = vecs(7L -> Seq(1.0, 2.0, 3.0, 4.0))
    val got = Quantization.subVectors(df, numSub = 2, subDim = 2)
      .as[(Long, Int, Seq[Double])].collect().toSet
    got shouldBe Set((7L, 0, Seq(1.0, 2.0)), (7L, 1, Seq(3.0, 4.0)))
  }

  "Quantization.pqEncode" should "pick the nearest codeword per subspace" in {
    // codewords per sub: code 0 at origin-ish, code 1 at (10,10)
    val cb = Seq((0, 0L, Seq(0.0, 0.0)), (0, 1L, Seq(10.0, 10.0)),
      (1, 0L, Seq(0.0, 0.0)), (1, 1L, Seq(10.0, 10.0)))
      .toDF("sub", "code", "cw")
    val df = vecs(1L -> Seq(1.0, 1.0, 9.0, 9.0))
    val got = Quantization.pqEncode(df, cb, numSub = 2, subDim = 2)
      .select("vec_id", "sub", "code").as[(Long, Int, Long)].collect().toSet
    got shouldBe Set((1L, 0, 0L), (1L, 1, 1L))
  }

  it should "break distance ties on the lowest code id" in {
    val cb = Seq((0, 5L, Seq(1.0, 0.0)), (0, 3L, Seq(-1.0, 0.0)))
      .toDF("sub", "code", "cw")
    // equidistant from both codewords
    val df = vecs(1L -> Seq(0.0, 0.0))
    val got = Quantization.pqEncode(df, cb, numSub = 1, subDim = 2)
      .select("code").as[Long].head()
    got shouldBe 3L
  }

  "Quantization.pqTrainCodebooks" should "move codewords to cluster means" in {
    // two tight clusters per subspace; seeds are one member of each
    val df = vecs(
      0L -> Seq(0.0, 0.0, 10.0, 10.0),
      1L -> Seq(8.0, 8.0, 1.0, 1.0),
      2L -> Seq(0.2, 0.2, 10.2, 10.2),
      3L -> Seq(8.2, 8.2, 1.2, 1.2))
    val cb = Quantization.pqTrainCodebooks(df, numSub = 2, subDim = 2,
      k = 2, iters = 2)
      .as[(Int, Long, Seq[Double])].collect()
      .map { case (sub, code, cw) => (sub, code) -> cw }.toMap
    cb((0, 0L)) shouldBe Seq(0.1, 0.1)   // mean of vecs 0,2 sub 0
    cb((0, 1L)) shouldBe Seq(8.1, 8.1)   // mean of vecs 1,3 sub 0
    cb((1, 0L)) shouldBe Seq(10.1, 10.1) // mean of vecs 0,2 sub 1
    cb((1, 1L)) shouldBe Seq(1.1, 1.1)   // mean of vecs 1,3 sub 1
  }

  "Quantization.pqAdcTopK" should
    "equal exact L2 ranking when every vector is its own codeword" in {
    // k-codebook = the corpus itself (iters = 0 keeps the seeds): encoding
    // is lossless, so ADC distance == rounded true distance and the PQ
    // ranking must match brute-force L2 exactly.
    val rnd = new scala.util.Random(42)
    val rows = (0L until 20L).map(i => i -> Seq.fill(8)(rnd.nextDouble()))
    val df = vecs(rows: _*)
    val cb = Quantization.pqTrainCodebooks(df, numSub = 2, subDim = 4,
      k = 20, iters = 0)
    val got = Quantization.pqAdcTopK(df.where(col("vec_id") < 3), df, cb,
      numSub = 2, subDim = 4, k = 4)
      .select("query_id", "cand_id", "rank").as[(Long, Long, Int)]
      .collect().toSet

    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // ADC sums PER-SUBSPACE micro-rounded distances — mirror that exactly
    def adcMicro(q: Seq[Double], c: Seq[Double]): Long =
      (0 until 2).map { m =>
        val d = l2(q.slice(m * 4, m * 4 + 4), c.slice(m * 4, m * 4 + 4))
        val r6 = math.floor(d * 1e6 + 0.5) / 1e6
        math.floor(r6 * 1e6 + 0.5).toLong
      }.sum
    val byId = rows.toMap
    val want = (0L until 3L).flatMap { q =>
      rows.filter(_._1 != q)
        .map { case (c, v) => (c, adcMicro(byId(q), v)) }
        .sortBy { case (c, d) => (d, c) }.take(4).zipWithIndex
        .map { case ((c, _), r) => (q, c, r + 1) }
    }.toSet
    got shouldBe want
  }

  "Quantization.ivfPqTopK" should
    "equal exact L2 ranking with lossless residual codebooks, all cells probed" in {
    // Within a shared cell, ||(q-c)-(x-c)|| == ||q-x||: with every residual
    // sub-vector its own codeword (lossless) and nProbe = #cells, IVFADC
    // must reproduce brute-force L2 exactly (modulo the same per-subspace
    // micro-rounding pqAdcTopK applies).
    val rnd = new scala.util.Random(7)
    val rows = (0L until 24L).map(i => i -> Seq.fill(8)(rnd.nextDouble()))
    val df = vecs(rows: _*)
    val cents = df.where(col("vec_id") < 3)
    val resid = Quantization.ivfResiduals(df, cents)
    val cb = Quantization.pqTrainCodebooks(
      resid, numSub = 2, subDim = 4, k = 24, iters = 0, vec = "rv")
    val got = Quantization.ivfPqTopK(df.where(col("vec_id") < 4), df, cents, cb,
      numSub = 2, subDim = 4, k = 4, nProbe = 3)
      .select("query_id", "cand_id", "rank").as[(Long, Long, Int)]
      .collect().toSet

    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      def dot(x: Seq[Double], y: Seq[Double]) =
        x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p * q }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val byId = rows.toMap
    val centIds = Seq(0L, 1L, 2L)
    def cellOf(v: Seq[Double]): Long =
      centIds.map(c => (math.floor(cos(v, byId(c)) * 1e6 + 0.5) / 1e6, c))
        .minBy { case (s, c) => (-s, c) }._2
    def adcMicro(q: Seq[Double], c: Seq[Double], cell: Long): Long = {
      val qr = q.zip(byId(cell)).map { case (a, b) => a - b }
      val cr = c.zip(byId(cell)).map { case (a, b) => a - b }
      (0 until 2).map { m =>
        val d = l2(qr.slice(m * 4, m * 4 + 4), cr.slice(m * 4, m * 4 + 4))
        val r6 = math.floor(d * 1e6 + 0.5) / 1e6
        math.floor(r6 * 1e6 + 0.5).toLong
      }.sum
    }
    val want = (0L until 4L).flatMap { q =>
      rows.filter(_._1 != q)
        .map { case (c, v) => (c, adcMicro(byId(q), v, cellOf(v))) }
        .sortBy { case (c, d) => (d, c) }.take(4).zipWithIndex
        .map { case ((c, _), r) => (q, c, r + 1) }
    }.toSet
    got shouldBe want
  }

  it should "restrict ADC to probed cells (cell-keyed code join)" in {
    // nProbe = 1: a candidate whose cell the query does not probe must be
    // absent even if its ADC distance would rank it.
    val df = vecs(
      0L -> Seq(1.0, 0.0, 0.0, 0.0),  // centroid A
      1L -> Seq(0.0, 1.0, 0.0, 0.0),  // centroid B
      2L -> Seq(0.9, 0.1, 0.0, 0.0),  // cell A
      3L -> Seq(0.1, 0.9, 0.0, 0.0),  // cell B
      4L -> Seq(0.8, 0.2, 0.0, 0.0))  // cell A, the query
    val cents = df.where(col("vec_id") < 2)
    val resid = Quantization.ivfResiduals(df, cents)
    val cb = Quantization.pqTrainCodebooks(
      resid, numSub = 2, subDim = 2, k = 5, iters = 0, vec = "rv")
    val got = Quantization.ivfPqTopK(df.where(col("vec_id") === 4), df, cents,
      cb, numSub = 2, subDim = 2, k = 5, nProbe = 1)
      .select("cand_id").as[Long].collect().toSet
    got shouldBe Set(0L, 2L) // only cell A members; 1 and 3 unprobed
  }

  "Quantization.seedCodebooks" should
      "seed from the k LOWEST PRESENT ids on a gapped fixture" in {
    // the v11 gate seeds codebooks from `vec_id >= 8` and its SQL twin
    // replays "the 8 lowest ids >= 8" — this pins the Spark-side contract
    // both mean: k lowest ids PRESENT in the (possibly gapped) input, not
    // a contiguous id range
    val df = vecs(3L -> Seq(1.0, 2.0), 11L -> Seq(3.0, 4.0),
      40L -> Seq(5.0, 6.0), 41L -> Seq(7.0, 8.0))
    val got = Quantization.seedCodebooks(df.where(col("vec_id") >= 8),
        numSub = 1, subDim = 2, k = 2)
      .select("code").as[Long].collect().toSet
    got shouldBe Set(11L, 40L)
  }

  it should "never read corpus vectors past encoding (narrow code rows)" in {
    val rows = (0L until 6L).map(i => i -> Seq.fill(4)(i.toDouble))
    val df = vecs(rows: _*)
    val cb = Quantization.seedCodebooks(df, numSub = 2, subDim = 2, k = 2)
    val plan = Quantization.pqAdcTopK(df.where(col("vec_id") < 2), df, cb,
      numSub = 2, subDim = 2, k = 2)
      .queryExecution.executedPlan.toString
    // the candidate aggregation joins on (sub, code) via broadcast —
    // no cross/nested-loop shape anywhere in the ADC plan
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  "Quantization.buildIvfPqIndex" should
    "train a full index whose lossless search equals exact L2" in {
    // the production constructor: TRAINED coarse centroids + codebooks.
    // With codebookK = n every residual stays its own codeword (Lloyd
    // fixes singleton clusters), so search over the built index must
    // reproduce exact L2 ranking — through trained cells this time.
    val rnd = new scala.util.Random(23)
    val rows = (0L until 24L).map(i => i -> Seq.fill(8)(rnd.nextDouble()))
    val df = vecs(rows: _*)
    val (cents, cb, codes) = Quantization.buildIvfPqIndex(df,
      numSub = 2, subDim = 4, codebookK = 24, nCells = 2,
      kmeansIters = 1, pqIters = 0)
    codes.count() shouldBe 24L * 2   // n vectors x numSub narrow rows
    cents.count() shouldBe 2L
    val got = Quantization.ivfPqSearch(df.where(col("vec_id") < 4),
      codes, cents, cb, numSub = 2, subDim = 4, k = 4, nProbe = 2,
      metric = "l2") // the index was built with the L2 coarse quantizer
      .select("query_id", "cand_id", "rank").as[(Long, Long, Int)]
      .collect().toSet

    def dot(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p * q }
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byId = rows.toMap
    val centVecs = cents.as[(Long, Seq[Double])].collect().toMap
    // L2 coarse assignment in the engine's IEEE order (v·v − 2v·c) + c·c,
    // 6-dp-rounded, lowest-id tiebreak
    def cellOf(v: Seq[Double]): Long =
      centVecs.toSeq.map { case (c, cv) =>
        val d = (dot(v, v) - 2 * dot(v, cv)) + dot(cv, cv)
        (math.floor(d * 1e6 + 0.5) / 1e6, c) }
        .minBy { case (s, c) => (s, c) }._2
    def adcMicro(q: Seq[Double], c: Seq[Double], cell: Long): Long = {
      val qr = q.zip(centVecs(cell)).map { case (a, b) => a - b }
      val cr = c.zip(centVecs(cell)).map { case (a, b) => a - b }
      (0 until 2).map { m =>
        val d = l2(qr.slice(m * 4, m * 4 + 4), cr.slice(m * 4, m * 4 + 4))
        val r6 = math.floor(d * 1e6 + 0.5) / 1e6
        math.floor(r6 * 1e6 + 0.5).toLong
      }.sum
    }
    val want = (0L until 4L).flatMap { q =>
      rows.filter(_._1 != q)
        .map { case (c, v) => (c, adcMicro(byId(q), v, cellOf(v))) }
        .sortBy { case (c, d) => (d, c) }.take(4).zipWithIndex
        .map { case ((c, _), r) => (q, c, r + 1) }
    }.toSet
    got shouldBe want
  }

  "Quantization.writeCodeIndex + ivfPqSearch" should
    "probe a bucketed code index with bucket pruning and no code-side Exchange" in {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 24L).map(i => i -> Seq.fill(8)(rnd.nextDouble()))
    val df = vecs(rows: _*)
    val cents = df.where(col("vec_id") < 3)
    val resid = Quantization.ivfResiduals(df, cents)
    val cb = Quantization.pqTrainCodebooks(
      resid, numSub = 2, subDim = 4, k = 8, iters = 1, vec = "rv")
    val queries = df.where(col("vec_id") < 4)
    try {
      // encode once, persist bucketed by cell — the write-once index
      Quantization.writeCodeIndex(
        Quantization.ivfPqEncode(df, cents, cb, numSub = 2, subDim = 4),
        "pq_code_idx", numBuckets = 4)
      val indexed = Quantization.ivfPqSearch(queries,
        spark.table("pq_code_idx"), cents, cb,
        numSub = 2, subDim = 4, k = 4, nProbe = 2, pruneProbedCells = true)
      // identical results to the inline (unpersisted, unpruned) form
      val inline = Quantization.ivfPqTopK(queries, df, cents, cb,
        numSub = 2, subDim = 4, k = 4, nProbe = 2)
        .as[(Long, Long, Double, Int)].collect().toSet
      indexed.as[(Long, Long, Double, Int)].collect().toSet shouldBe inline
      val plan = indexed.queryExecution.executedPlan.toString
      // probed-cell IN filter + bucketBy layout = bucket pruning: the
      // scan reads only the probed cells' buckets...
      plan should include("SelectedBucketsCount")
      // ...and the code side streams straight from them into the
      // broadcast ADC join — no shuffle anywhere before the per-
      // (query, cand) sum aggregation
      plan should not include "Exchange hashpartitioning(centroid_id"
      plan should include("BroadcastHashJoin")
    } finally spark.sql("DROP TABLE IF EXISTS pq_code_idx")
  }

  "Quantization.sqTrain/sqEncode" should
    "encode the min to 0, the max to 255, and stay within [0, 255]" in {
    val df = vecs(
      0L -> Seq(-1.0, 5.0), 1L -> Seq(0.0, 5.0), 2L -> Seq(3.0, 5.0))
    val bounds = Quantization.sqTrain(df)
    val codes = Quantization.sqEncode(df, bounds)
      .as[(Long, Int, Long)].collect()
      .map { case (id, dim, c) => (id, dim) -> c }.toMap
    codes((0L, 0)) shouldBe 0L    // the per-dim min
    codes((2L, 0)) shouldBe 255L  // the per-dim max
    codes((1L, 0)) shouldBe (255L * 1000000L) / 4000000L // linear interior
    // degenerate dimension (span 0) encodes as 0, not a divide-by-zero
    codes((0L, 1)) shouldBe 0L
    codes((2L, 1)) shouldBe 0L
    codes.values.foreach { c => c should (be >= 0L and be <= 255L) }
  }

  "Quantization.sqAdcTopK" should
    "rank by true distance on grid-exact values" in {
    // all values sit exactly on the 1-D grid between min 0 and max 255
    // micro-millionths? use 0..255 scaled so codes reconstruct exactly:
    // values k/255 for k in {0, 51, 102, 255} → span 1.0, code = k
    val corpus = vecs(
      0L -> Seq(0.0), 1L -> Seq(51.0 / 255), 2L -> Seq(102.0 / 255),
      3L -> Seq(1.0))
    val bounds = Quantization.sqTrain(corpus)
    val codes = Quantization.sqEncode(corpus, bounds)
    val got = Quantization.sqAdcTopK(
        corpus.where(col("vec_id") === 0), codes, bounds, k = 3)
      .select("cand_id", "rank").as[(Long, Int)].collect().toSet
    got shouldBe Set((1L, 1), (2L, 2), (3L, 3))
  }

  it should "keep the corpus side free of vector columns (narrow scan)" in {
    val corpus = vecs(0L -> Seq(0.0, 1.0), 1L -> Seq(0.5, 0.5),
      2L -> Seq(1.0, 0.0))
    val bounds = Quantization.sqTrain(corpus)
    val codes = Quantization.sqEncode(corpus, bounds)
    val plan = Quantization.sqAdcTopK(
      corpus.where(col("vec_id") === 0), codes, bounds, k = 2)
      .queryExecution.executedPlan.toString
    // the candidate scoring join must be broadcast (decode table side),
    // never a shuffle of the code rows against the distance table
    plan should include("BroadcastHashJoin")
  }

  "Quantization.binaryQuantize" should "set bit i of the halves iff dim i is positive" in {
    // dims 0, 33, 63 positive; 31 negative; zero stays 0
    val e = Array.fill(64)(0.0)
    e(0) = 0.5; e(33) = 1.0; e(63) = 2.0; e(31) = -1.0
    val got = Quantization.binaryQuantize(vecs(1L -> e.toSeq))
      .as[(Long, Long, Long)].collect().head
    got._2 shouldBe ((1L << 1) | (1L << 31)) // hi: bits 33-32=1, 63-32=31
    got._3 shouldBe 1L                       // lo: bit 0
  }

  "Quantization.hammingTopK" should "rank by popcount distance with id ties" in {
    def v(bits: Seq[Int]) = (0 until 64).map(i =>
      if (bits.contains(i)) 1.0 else -1.0)
    val corpus = vecs(
      1L -> v(Seq(0, 5, 40)),       // the query
      2L -> v(Seq(0, 5, 40)),       // dist 0
      3L -> v(Seq(0, 5)),           // dist 1
      4L -> v(Seq(0, 5, 40, 63)),   // dist 1 — tie with 3, loses on id
      5L -> v(Seq(7)))              // far
    val got = Quantization.hammingTopK(
        corpus.where(col("vec_id") === 1L), corpus, k = 3)
      .select("cand_id", "hamming", "rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    got.map(_._1).toSeq shouldBe Seq(2L, 3L, 4L)
    got.map(_._2).toSeq shouldBe Seq(0L, 1L, 1L)
  }

  "Quantization.adcRerank" should "order the shortlist by exact distance" in {
    // shortlist deliberately in the WRONG (approximate) order: exact L2
    // from query (0,0) ranks 30 < 10 < 20
    val corpus = vecs(10L -> Seq(3.0, 0.0), 20L -> Seq(5.0, 0.0),
      30L -> Seq(1.0, 0.0), 40L -> Seq(0.1, 0.0))
    val queries = vecs(1L -> Seq(0.0, 0.0))
    val shortlist = Seq((1L, 10L), (1L, 20L), (1L, 30L))
      .toDF("query_id", "cand_id")
    val got = Quantization.adcRerank(shortlist, queries, corpus, k = 2)
      .select("query_id", "cand_id", "dist", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    // 40 is NOT in the shortlist, so it cannot appear however close it is
    got.map(_._2).toSeq shouldBe Seq(30L, 10L)
    got.map(_._3).toSeq shouldBe Seq(1.0, 9.0)
  }

  it should "broadcast the shortlist against the corpus scan" in {
    val corpus = vecs((0L to 50L).map(i => i -> Seq(i.toDouble, 0.0)): _*)
    val queries = vecs(1L -> Seq(0.0, 0.0))
    val shortlist = Seq((1L, 10L), (1L, 20L)).toDF("query_id", "cand_id")
    val plan = Quantization.adcRerank(shortlist, queries, corpus, k = 2)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }
}
