package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Distributed sketch aggregates.
  *
  * At 100 TB an exact `count(DISTINCT x)` is a full shuffle of every
  * distinct value; a mergeable fixed-size sketch turns it into one
  * aggregation pass with a few-KB buffer per group — the classic
  * cardinality shape for corpus telemetry (distinct users, URLs, shingles
  * per slice). Spark ships `approx_count_distinct` (HyperLogLog++), but
  * its register assignment rides on Spark's internal 64-bit hash, which
  * no external engine can replay — so it can never sit behind the
  * driver's DuckDB hash-compare. [[HllAggregator]] is the
  * oracle-checkable complement: classic Flajolet et al. HyperLogLog over
  * the repo's engine-replayable [[graft.functions.PolyHash]] stream
  * (h ∈ [0, 1e9+7)), with every register derivation integer-exact so an
  * oracle derives byte-identical registers from the same hashes.
  *
  * Register math (p index bits, m = 2^p registers, 30-bit hash space
  * since P < 2^30): idx = h mod m, w = h div m < 2^(30−p),
  * rho = (30−p) − floor(log2 w) for w > 0 (= leading-zero count of the
  * (30−p)-bit word + 1), rho = (30−p)+1 for w = 0. The estimator's
  * indicator sum is kept scaled by 2^((30−p)+1) so it is an exact
  * integer — cross-partition double addition order can never perturb
  * it; the only floating steps are the final alpha·m²/S division and
  * the small-range `m·ln(m/V)` correction, identical one-liners in both
  * engines.
  */
object Sketches {

  /** Per-group HLL summary: `nonzero` = registers hit, `sum_scaled` =
    * Σ_j 2^(rhoMax − M_j) (exact integer, rhoMax = (30−p)+1), `estimate`
    * = bias-corrected cardinality estimate. */
  final case class HllSummary(nonzero: Int, sum_scaled: Long, estimate: Double)

  /** 30-bit finalizer over the raw PolyHash value — PolyHash is built
    * for shingle equality, not avalanche: sequential keys ("u:1",
    * "u:2", …) land nearly collision-free mod m, which biases linear
    * counting high (~7% measured at n=500, p=12). Two
    * multiply-mod-2^30 + xor-shift rounds fix the mixing while staying
    * exactly replayable in SQL (every product < 2^62, no wrap): DuckDB
    * spells it (z * c) % 1073741824 and xor(z, z // 2^k). */
  def scramble30(h: Long): Long = {
    var z = (h * 2654435761L) % (1L << 30)
    z ^= z >>> 15
    z = (z * 1597334677L) % (1L << 30)
    z ^ (z >>> 13)
  }

  /** HyperLogLog over pre-hashed values (use
    * [[graft.functions.PolyHash.poly_hash]] of a seeded string form so
    * the oracle can replay the stream). Nulls don't reach the aggregator
    * (filter upstream); hashes outside [0, 2^30) are rejected loudly —
    * they would silently skew rho. */
  class HllAggregator(p: Int) extends Aggregator[Long, Array[Byte], HllSummary] {
    require(p >= 4 && p <= 16, s"p in [4,16], got $p")
    private val m = 1 << p
    private val vBits = 30 - p // value bits available for rho
    private val rhoMax = vBits + 1

    override def zero: Array[Byte] = new Array[Byte](m)

    override def reduce(regs: Array[Byte], h0: Long): Array[Byte] = {
      if (h0 < 0 || h0 >= (1L << 30)) throw new IllegalArgumentException(
        s"HllAggregator expects a PolyHash value in [0, 2^30), got $h0")
      val h = scramble30(h0)
      val idx = (h % m).toInt
      val w = h >>> p // div m; idx uses the low bits, rho the high ones
      val rho =
        if (w == 0) rhoMax
        else vBits - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(idx)) regs(idx) = rho.toByte
      regs
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(regs: Array[Byte]): HllSummary = {
      var nz = 0
      var sum = 0L
      var i = 0
      while (i < m) {
        val r = regs(i) & 0xff
        if (r > 0) nz += 1
        sum += 1L << (rhoMax - r)
        i += 1
      }
      // alpha(m) for m >= 128 (Flajolet et al. Fig. 3); the raw estimate
      // and the DuckDB twin are the same literal double expression
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val raw = alpha * m.toDouble * m.toDouble *
        (1L << rhoMax).toDouble / sum.toDouble
      val zeros = m - nz
      val est =
        if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
        else raw
      HllSummary(nz, sum, est)
    }

    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[HllSummary] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[HllSummary]()
  }

  /** Grouped distinct-count sketch: one aggregation pass over `df`,
    * buffer = 2^p bytes per group (map-side combined — the shuffle moves
    * one sketch per group per partition, never per-value rows). `hash`
    * must be an engine-replayable PolyHash column. Returns one row per
    * group: (groupCols..., nonzero, sum_scaled, estimate). */
  def hllDistinct(df: DataFrame, groupCols: Seq[Column], hash: Column,
                  p: Int = 12): DataFrame = {
    val agg = udaf(new HllAggregator(p), Encoders.scalaLong)
    df.groupBy(groupCols: _*)
      .agg(agg(hash).as("hll"))
      .select(groupCols ++ Seq(col("hll.nonzero").as("nonzero"),
        col("hll.sum_scaled").as("sum_scaled"),
        col("hll.estimate").as("estimate")): _*)
  }

  // ---- Count-Min ----------------------------------------------------------

  /** Row `j`'s counter index for raw PolyHash `h`: scramble the
    * j-salted hash, take the low `log2(w)` bits. (j+1)·h stays below
    * 2^33, so the scramble's first product is < 2^65… too big — salt by
    * ADDITION instead: (h + j·0x9E3779B9) mod 2^30 keeps every product
    * within the scramble's proven range while giving each row an
    * independent stream. Pure integer math — replayable in SQL with no
    * floating step anywhere. */
  def cmsIndex(h: Long, j: Int, w: Int): Int =
    (scramble30((h + j.toLong * 2654435769L) % (1L << 30)) % w).toInt

  /** Count-Min frequency sketch (Cormode–Muthukrishnan): `d` counter
    * rows × `w` counters, point estimate = min over rows — the
    * fixed-size frequency complement of [[HllAggregator]]'s cardinality
    * sketch (heavy-hitter words/URLs/users per slice without a
    * per-value shuffle). The buffer is d·w longs per group, merged by
    * elementwise addition (fully mergeable, map-side combined). Output
    * is the FLAT counter array (row j at offsets [j·w, (j+1)·w)), so
    * point queries run as plain column ops downstream
    * (element_at + array_min) and the whole structure is an exact
    * integer object any engine can rebuild from the same hashes —
    * estimates carry NO floating arithmetic at all. */
  class CmsAggregator(d: Int, w: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(d >= 1 && d <= 8, s"d in [1,8], got $d")
    require(w >= 16 && (w & (w - 1)) == 0, s"w a power of two >= 16, got $w")

    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(counters: Array[Long], h: Long): Array[Long] = {
      if (h < 0 || h >= (1L << 30)) throw new IllegalArgumentException(
        s"CmsAggregator expects a PolyHash value in [0, 2^30), got $h")
      var j = 0
      while (j < d) {
        counters(j * w + cmsIndex(h, j, w)) += 1
        j += 1
      }
      counters
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(counters: Array[Long]): Seq[Long] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(counters)

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Grouped Count-Min sketch build: one aggregation pass, one
    * (groupCols..., sketch: array<bigint>) row per group. */
  def cmsSketch(df: DataFrame, groupCols: Seq[Column], hash: Column,
                d: Int = 4, w: Int = 2048): DataFrame = {
    val agg = udaf(new CmsAggregator(d, w), Encoders.scalaLong)
    df.groupBy(groupCols: _*)
      .agg(agg(hash).as("sketch"))
  }

  // ---- Bloom filter -------------------------------------------------------

  /** Bloom-filter bitset build: `d` bits per value at [[cmsIndex]]
    * positions over `mBits` bits, packed into a long[] bitset — a CMS
    * row degenerated to presence bits. Mergeable by OR; the classic
    * shuffle reducer: build on a join's SMALL side, broadcast the
    * few-KB bitset, and drop non-members of the LARGE side BEFORE the
    * shuffle. False positives pass (the exact join downstream removes
    * them); false negatives cannot happen — membership of every built
    * value is a hard guarantee, so the composed semi-join is
    * row-identical to the plain one. */
  class BloomAggregator(d: Int, mBits: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(d >= 1 && d <= 8, s"d in [1,8], got $d")
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits a power of two >= 64, got $mBits")

    override def zero: Array[Long] = new Array[Long](mBits / 64)

    override def reduce(bits: Array[Long], h: Long): Array[Long] = {
      if (h < 0 || h >= (1L << 30)) throw new IllegalArgumentException(
        s"BloomAggregator expects a PolyHash value in [0, 2^30), got $h")
      var j = 0
      while (j < d) {
        val idx = cmsIndex(h, j, mBits)
        bits(idx >>> 6) |= 1L << (idx & 63)
        j += 1
      }
      bits
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(bits: Array[Long]): Seq[Long] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(bits)

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Build one Bloom bitset over `hash` (ungrouped — one row out). */
  def bloomBuild(df: DataFrame, hash: Column,
                 d: Int = 4, mBits: Int = 1 << 17): DataFrame = {
    val agg = udaf(new BloomAggregator(d, mBits), Encoders.scalaLong)
    df.agg(agg(hash).as("bloom"))
  }

  /** Membership predicate against a single broadcast bitset row: keeps
    * `probe` rows whose `hash` tests positive in all `d` positions —
    * the pre-shuffle filter. Pure column ops (same scramble spelled in
    * Spark arithmetic), map-only after the broadcast. */
  def bloomMightContain(probe: DataFrame, bloom: DataFrame, hash: Column,
                        d: Int = 4, mBits: Int = 1 << 17): DataFrame = {
    val hits: Seq[Column] = (0 until d).map { j =>
      val salted = pmod(hash + lit(j.toLong * 2654435769L), lit(1L << 30))
      val z1 = pmod(salted * lit(2654435761L), lit(1L << 30))
      val z2 = z1.bitwiseXOR(shiftright(z1, 15))
      val z3 = pmod(z2 * lit(1597334677L), lit(1L << 30))
      val idx = pmod(z3.bitwiseXOR(shiftright(z3, 13)), lit(mBits))
      // dynamic shift amounts need the SQL function form — the Scala
      // shiftleft/shiftright helpers only take literal counts
      val word = element_at(col("bloom"),
        (call_function("shiftright", idx, lit(6)) + 1).cast("int"))
      val mask = call_function("shiftleft", lit(1L),
        pmod(idx, lit(64)).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }
    probe.crossJoin(broadcast(bloom))
      .where(hits.reduce(_ && _))
      .drop("bloom")
  }

  /** Point estimates from a built sketch, as pure column ops (no second
    * aggregation): `probes` is a small frame of (probe key, raw PolyHash
    * `hash` LongType column); result attaches `est` = min over the d
    * rows. The scramble is spelled in Spark column arithmetic — the
    * exact integer ops [[cmsIndex]] runs on the JVM. */
  def cmsEstimate(sketches: DataFrame, probes: DataFrame, hash: Column,
                  d: Int = 4, w: Int = 2048): DataFrame = {
    val idxCols: Seq[Column] = (0 until d).map { j =>
      val salted = pmod(hash + lit(j.toLong * 2654435769L), lit(1L << 30))
      val z1 = pmod(salted * lit(2654435761L), lit(1L << 30))
      val z2 = z1.bitwiseXOR(shiftright(z1, 15))
      val z3 = pmod(z2 * lit(1597334677L), lit(1L << 30))
      val z = z3.bitwiseXOR(shiftright(z3, 13))
      element_at(col("sketch"), (lit(j * w) + pmod(z, lit(w)) + 1).cast("int"))
    }
    sketches.crossJoin(broadcast(probes))
      .withColumn("est", array_min(array(idxCols: _*)))
      .drop("sketch")
  }

  /** Heavy hitters (keys with ≥ `threshold` occurrences) WITHOUT a
    * per-distinct-key shuffle — the Count-Min sketch applied the way
    * [[bloomMightContain]] applies the Bloom filter to joins:
    *
    *   pass 1: ONE aggregation pass builds a global d×w counter sketch
    *           (fixed-size, mergeable, map-side combined);
    *   pass 2: re-scan the data, estimate each ROW's key count from the
    *           broadcast sketch as pure column ops, and drop rows whose
    *           estimate is under the threshold MAP-SIDE — before any
    *           shuffle;
    *   pass 3: exact count over the surviving (heavy-candidate) rows
    *           only, then the exact HAVING filter.
    *
    * CMS never underestimates, so no true heavy key can be dropped in
    * pass 2 (no false negatives); pass 3 removes the overestimated
    * stragglers — the composed result is row-identical to the plain
    * `GROUP BY key HAVING count ≥ threshold`, which is the oracle. At
    * 100 TB the full-key shuffle (every row, every distinct key) becomes
    * a shuffle of just the heavy candidates — for skewed corpora
    * (heavy-hitter detection's whole point) that is orders of magnitude
    * less. */
  def cmsHeavyHitters(df: DataFrame, key: Column, hash: Column,
                      threshold: Long, d: Int = 4, w: Int = 2048): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val sketch = df.agg(udaf(new CmsAggregator(d, w), Encoders.scalaLong)
      .apply(hash).as("sketch"))
    val estCols: Seq[Column] = (0 until d).map { j =>
      val salted = pmod(hash + lit(j.toLong * 2654435769L), lit(1L << 30))
      val z1 = pmod(salted * lit(2654435761L), lit(1L << 30))
      val z2 = z1.bitwiseXOR(shiftright(z1, 15))
      val z3 = pmod(z2 * lit(1597334677L), lit(1L << 30))
      val z = z3.bitwiseXOR(shiftright(z3, 13))
      element_at(col("sketch"), (lit(j * w) + pmod(z, lit(w)) + 1).cast("int"))
    }
    df.crossJoin(broadcast(sketch))
      .where(array_min(array(estCols: _*)) >= threshold) // map-side prune
      .groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
  }

  // ---- K-minimum-values (bottom-k) set sketches ---------------------------

  /** Column form of [[scramble30]] — the identical two-round
    * multiply-mod-2^30 + xor-shift chain as plain column arithmetic
    * (whole-stage codegen; the SQL twin spells the same five steps). */
  def scramble30Column(h: Column): Column = {
    val m = lit(1L << 30)
    val z1 = (h * lit(2654435761L)) % m
    val x1 = z1.bitwiseXOR(shiftrightunsigned(z1, 15))
    val z2 = (x1 * lit(1597334677L)) % m
    z2.bitwiseXOR(shiftrightunsigned(z2, 13))
  }

  /** K-minimum-values sketch (Bar-Yossef et al.'s bottom-k): the k
    * smallest DISTINCT scrambled hashes per group, as one sorted
    * array<bigint> row per group. The set-ALGEBRA complement of the HLL
    * cardinality sketch: because a value hashes identically in every
    * set, sketches of different sets are comparable element-wise —
    * unions merge as "k smallest of the concatenation" and
    * intersections/Jaccard fall out of union-sketch membership
    * ([[kmvSetOps]]). Every number is an integer (hash domain
    * [0, 2^30)), so estimates replay exactly in SQL.
    *
    * Scale shape: the global k-min is computed hierarchically — distinct
    * (group, hash) rows first reduce to a per-(group, hash mod
    * `saltCells`) k-min (each window cell sees ~1/saltCells of the
    * group's distinct hashes), then the per-group k-min over the
    * ≤ saltCells·k survivors. The global bottom-k is a subset of the
    * union of cell bottom-ks, so the two-stage result is EXACTLY the
    * one-stage result while no single task ever sorts a whole group. */
  def kmvSketch(df: DataFrame, groupCols: Seq[Column], hash: Column,
                k: Int = 256, saltCells: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(saltCells >= 1, s"saltCells must be >= 1, got $saltCells")
    val scrambled = df.select(groupCols :+ scramble30Column(hash).as("h"): _*)
      .distinct()
    val cellCols = scrambled.columns.dropRight(1).map(col)
    val stage1 = scrambled
      .withColumn("cell", pmod(col("h"), lit(saltCells.toLong)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(cellCols :+ col("cell"): _*).orderBy("h")))
      .where(col("rn") <= k)
    val stage2 = stage1
      .withColumn("rn2", row_number().over(
        Window.partitionBy(cellCols: _*).orderBy("h")))
      .where(col("rn2") <= k)
    stage2.groupBy(cellCols: _*)
      .agg(sort_array(collect_list(col("h"))).as("kmv"))
  }

  /** Pairwise set algebra from [[kmvSketch]] rows: for every unordered
    * group pair (a < b), integer-exact estimates of |A|, |B|, |A∪B|,
    * Jaccard (per-mille), and |A∩B| — the decontamination / split-
    * leakage / corpus-overlap measurement over sets too large to
    * intersect exactly. All from the bottom-k identity: the k smallest
    * of (sorted_a ∪ sorted_b) is the union's sketch U; members of U
    * present in BOTH sketches estimate Jaccard as m/|U|; cardinalities
    * are (|S|−1)·2^30 div S.last when the sketch is full, else the exact
    * distinct count (a sketch smaller than k IS its whole set). The
    * pair join is sketch-row × sketch-row — #groups² model-sized rows,
    * never data-sized (the benign a15-style cross). */
  def kmvSetOps(sketches: DataFrame, groupCol: String, k: Int): DataFrame = {
    // every division is the SQL integer `div` — a float quotient's
    // 53-bit rounding could cross an integer boundary that 2^30-domain
    // numerators genuinely straddle, and the twin divides integers
    val km1 = (k - 1).toLong * (1L << 30)
    def estCard(sk: String): String =
      s"case when size($sk) >= $k then ${km1}L div element_at($sk, $k) " +
        s"else cast(size($sk) as bigint) end"
    val a = sketches.select(col(groupCol).as("set_a"), col("kmv").as("ka"))
    val b = sketches.select(col(groupCol).as("set_b"), col("kmv").as("kb"))
    a.join(b, col("set_a") < col("set_b"))
      .withColumn("u", slice(array_sort(array_union(col("ka"), col("kb"))), 1, k))
      .withColumn("m", size(array_intersect(col("u"),
        array_intersect(col("ka"), col("kb")))).cast("long"))
      .withColumn("est_a", expr(estCard("ka")))
      .withColumn("est_b", expr(estCard("kb")))
      .withColumn("est_union", expr(estCard("u")))
      .withColumn("jaccard_milli", expr("(m * 1000) div size(u)"))
      .withColumn("est_intersection", expr("(m * est_union) div size(u)"))
      .select("set_a", "set_b", "est_a", "est_b", "est_union", "m",
        "jaccard_milli", "est_intersection")
  }

  // ---- HDR histogram quantiles -------------------------------------------

  /** Per-group quantile summary: `n` = total count, `quantiles(i)` = the
    * bucket lower bound holding the ceil(qsPermille(i)/1000 · n)-th
    * smallest value. */
  final case class HdrSummary(n: Long, quantiles: Seq[Long])

  /** Mergeable histogram quantile sketch over non-negative integers
    * (HdrHistogram's bucketing: base-2 exponent ranges split into
    * 2^(subBits−1) linear sub-buckets — Tene's High Dynamic Range
    * histogram). The quantile shape for 100 TB telemetry: a GROUP BY
    * with an exact per-group percentile needs every value shuffled to
    * its group (the a7/a6 sort path); this sketch is ONE aggregation
    * pass with a fixed few-KB counter buffer per group, mergeable
    * map-side, at a bounded relative error of 2^−(subBits−1).
    *
    * Everything is integer bit arithmetic: bucket index derives from the
    * value's bit length, the reported quantile is the bucket's exact
    * lower bound, and rank = ceil-div(q_permille · n, 1000) — so an SQL
    * twin replays the identical histogram from `length(printf('%b', v))`
    * and matches hash-exactly. No floating step exists on either side.
    *
    * Bucketing (m = 2^subBits, half = m/2), for v in [0, 2^maxBits):
    *   v < m:  idx = v                      (exact linear region)
    *   else:   e = floor(log2 v) = bitlen−1,
    *           idx = m + (e − subBits)·half + (v >> (e − subBits + 1)) − half
    * Lower bound of idx ≥ m (j = idx − m):
    *           lb = (half + j mod half) << (j div half + 1)
    * Bucket width at value v is ≤ v / half — the relative-error bound.
    */
  class HdrAggregator(subBits: Int, maxBits: Int, qsPermille: Seq[Int])
      extends Aggregator[Long, Array[Long], HdrSummary] {
    require(subBits >= 2 && subBits <= 10, s"subBits in [2,10], got $subBits")
    require(maxBits > subBits && maxBits <= 62,
      s"maxBits in (subBits,62], got $maxBits")
    require(qsPermille.nonEmpty && qsPermille.forall(p => p >= 1 && p <= 1000),
      s"qsPermille in [1,1000], got $qsPermille")
    private val m = 1 << subBits
    private val half = m >> 1
    private val numBuckets = m + (maxBits - subBits) * half

    /** Histogram slot for value `v` — pure integer bit ops. */
    def bucketIndex(v: Long): Int =
      if (v < m) v.toInt
      else {
        val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
        m + (e - subBits) * half + (v >>> (e - subBits + 1)).toInt - half
      }

    /** Smallest value mapping to slot `idx` — the reported quantile. */
    def lowerBound(idx: Int): Long =
      if (idx < m) idx.toLong
      else {
        val j = idx - m
        (half + j % half).toLong << (j / half + 1)
      }

    override def zero: Array[Long] = new Array[Long](numBuckets)

    override def reduce(counts: Array[Long], v: Long): Array[Long] = {
      if (v < 0 || v >= (1L << maxBits)) throw new IllegalArgumentException(
        s"HdrAggregator expects a value in [0, 2^$maxBits), got $v")
      counts(bucketIndex(v)) += 1
      counts
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(counts: Array[Long]): HdrSummary = {
      var n = 0L
      var i = 0
      while (i < counts.length) { n += counts(i); i += 1 }
      val qs = qsPermille.map { p =>
        if (n == 0) 0L
        else {
          val rank = (p.toLong * n + 999L) / 1000L // ceil-div, all integer
          var cum = 0L
          var j = 0
          var found = -1
          while (found < 0 && j < counts.length) {
            cum += counts(j)
            if (cum >= rank) found = j
            j += 1
          }
          lowerBound(found)
        }
      }
      HdrSummary(n, qs)
    }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[HdrSummary] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[HdrSummary]()
  }

  /** Grouped quantile sketch: one aggregation pass, one row per group —
    * (groupCols..., n, q_<p> per requested permille). `value` must be a
    * non-negative LongType column (scale doubles to fixed-point cents
    * upstream so the histogram stays integer-exact). */
  def hdrQuantiles(df: DataFrame, groupCols: Seq[Column], value: Column,
                   qsPermille: Seq[Int] = Seq(500, 900, 990),
                   subBits: Int = 6, maxBits: Int = 40): DataFrame = {
    val agg = udaf(new HdrAggregator(subBits, maxBits, qsPermille),
      Encoders.scalaLong)
    val qCols = qsPermille.zipWithIndex.map { case (p, i) =>
      element_at(col("hdr.quantiles"), i + 1).as(s"q_$p")
    }
    df.groupBy(groupCols: _*)
      .agg(agg(value).as("hdr"))
      .select(groupCols ++ (col("hdr.n").as("n") +: qCols): _*)
  }
}
