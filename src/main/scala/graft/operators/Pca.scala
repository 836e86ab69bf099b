package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Principal component analysis over an embedding column — the trained
  * dimensionality-reduction complement to [[Similarity.randomProject]]
  * (JL is oblivious; PCA spends one corpus pass to put the variance where
  * the retained dimensions are). Used by training-data pipelines for
  * embedding whitening, ANN pre-reduction, and drift diagnostics.
  *
  * Scale shape: ONE distributed pass accumulates the d×d second-moment
  * matrix as integer micro-unit sums (partition-order-independent, so the
  * result is exactly deterministic at any parallelism); everything after
  * that — eigensolve, component storage — is driver math on a bounded
  * d(d+1)/2-entry object (d = 64 here; the d² explosion point is exactly
  * where you run [[Similarity.randomProject]] first). The projection back
  * over the corpus is a map-only literal-array dot fold per component,
  * fully inside whole-stage codegen — no shuffle anywhere but the one
  * tiny Gram aggregation (32 partitions × d(d+1)/2 partial rows).
  */
object Pca {

  /** Exact 1e-6 fixed-point second-moment (Gram) accumulation: one row
    * per upper-triangle cell (i ≤ j, 0-based), with
    * s_micro = Σ_rows ⌊x_i·x_j·10⁶ + 0.5⌋ and the row count n. Integer
    * sums make the result independent of partitioning and row order —
    * the engine-wide determinism contract. Per row the d(d+1)/2 products
    * stream through the hash aggregate (map-side combined), so the
    * shuffle is partitions × cells, never corpus-sized. */
  def gramMicro(df: DataFrame, vec: Column, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    // Stage the vector into its OWN projection first: the lambdas below
    // reference it 2 times per cell, and an inlined non-attribute child
    // (e.g. the float→double cast every caller passes) would re-evaluate
    // per reference — measured 11 s for 20k×64 vectors vs 1.4 s staged
    // (the v15 lesson). CollapseProject keeps multiply-referenced
    // non-cheap aliases staged.
    val v = col("__v")
    val prods = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        floor(element_at(v, i + 1) * element_at(v, j + 1) * 1000000 + 0.5)
          .cast("long"))))
    // cells aggregate on the PACKED upper-triangle position (primitive
    // long array through posexplode — no per-cell struct allocation);
    // (i, j) re-attach from a bounded broadcast mapping after the agg
    val agg = df.select(vec.as("__v"))
      .select(posexplode(prods).as(Seq("pidx", "p")))
      .groupBy("pidx").agg(count(lit(1)).as("n"), sum("p").as("s_micro"))
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val rows = (for { i <- 0 until dim; j <- i until dim } yield {
      val pidx = i * dim - i * (i - 1) / 2 + (j - i)
      org.apache.spark.sql.Row(pidx, i.toLong, j.toLong)
    }).asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pidx",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.LongType, nullable = false)))
    agg.join(broadcast(spark.createDataFrame(rows, schema)), "pidx")
      .select(col("i"), col("j"), col("n"), col("s_micro"))
  }

  /** Dominant component via `iters` fixed power-iteration steps — the
    * gate-checkable trained path: every operation is either exact integer
    * math or one IEEE op followed by 6-dp rounding, so a SQL twin replays
    * it bit-for-bit. The iteration matrix is the n-normalized integer
    * Gram c_ij = ⌊s_micro/n⌋ (micro-units of E[x_i x_j]; symmetric PSD,
    * so the all-ones start never needs a sign convention); each step is
    * y = C·vμ in exact 64-bit integers, then vμ' = ⌊y/‖y‖·10⁶ + 0.5⌋
    * with ‖y‖ folded over ascending i. Returns the unit component in
    * micro-units. The Gram frame is bounded (d(d+1)/2 rows) — collected
    * via the model-frame convention. */
  def powerComponentMicro(df: DataFrame, vec: Column, dim: Int,
                          iters: Int = 4): Array[Long] = {
    require(iters > 0, s"iters must be positive, got $iters")
    val g = graft.Lineage.cutSmall(gramMicro(df, vec, dim)).collect()
    require(g.nonEmpty, "powerComponentMicro: empty input")
    val n = g.head.getLong(2)
    val c = Array.ofDim[Long](dim, dim)
    g.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val v = math.floor(r.getLong(3).toDouble / n).toLong
      c(i)(j) = v; c(j)(i) = v
    }
    var vm = Array.fill(dim)(1000000L)
    for (_ <- 1 to iters) {
      val y = Array.tabulate(dim) { i =>
        var acc = 0L
        var j = 0
        while (j < dim) { acc += c(i)(j) * vm(j); j += 1 }
        acc
      }
      var sq = 0.0
      var i = 0
      while (i < dim) { val d = y(i).toDouble; sq += d * d; i += 1 }
      val nrm = math.sqrt(sq)
      vm = y.map(v => math.floor(v.toDouble / nrm * 1000000 + 0.5).toLong)
    }
    vm
  }

  /** Projection of every vector onto a micro-unit component: one
    * codegen'd left-fold dot product per row (ascending index — the
    * cross-engine fold-order contract), 6-dp-rounded. Map-only. */
  def projectMicro(df: DataFrame, id: Column, vec: Column,
                   componentMicro: Array[Long]): DataFrame = {
    // staged for the same reason as [[gramMicro]]: the fold references
    // the vector once per dimension
    val dot = componentMicro.zipWithIndex.foldLeft(lit(0.0)) {
      case (acc, (w, i)) =>
        acc + element_at(col("__v"), i + 1) * lit(w / 1000000.0)
    }
    df.select(id.as("vec_id"), vec.as("__v"))
      .select(col("vec_id"),
        (floor(dot * 1000000 + 0.5) / 1000000.0).as("proj"))
  }

  /** A trained PCA model: per-dimension means, orthonormal components
    * (rows, descending eigenvalue), and the covariance eigenvalues. */
  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]],
                            eigenvalues: Array[Double]) {
    require(components.length == eigenvalues.length)

    /** Map-only projection onto the top-k components: one literal-array
      * dot fold per component over the CENTERED vector, all codegen.
      * `whiten = true` scales each component by 1/√λ so the output has
      * unit variance per dimension (PCA whitening — the decorrelated
      * standardized features quantizers and distance metrics prefer);
      * components with λ ≤ 0 (numerically degenerate directions) refuse
      * loudly rather than divide by ~0. */
    def transform(df: DataFrame, id: Column, vec: Column, k: Int,
                  whiten: Boolean = false): DataFrame = {
      require(k >= 1 && k <= components.length,
        s"k must be in [1, ${components.length}], got $k")
      if (whiten) require(eigenvalues.take(k).forall(_ > 1e-12),
        "whitening needs strictly positive eigenvalues for the kept " +
          s"components; got ${eigenvalues.take(k).mkString(",")}")
      // staged so the k·dim element_at references read an attribute, not
      // a re-evaluated child (see gramMicro)
      val cols = (0 until k).map { c =>
        val scale = if (whiten) 1.0 / math.sqrt(eigenvalues(c)) else 1.0
        val comp = components(c)
        val dot = comp.zipWithIndex.foldLeft(lit(0.0)) {
          case (acc, (w, i)) =>
            acc + (element_at(col("__v"), i + 1) - lit(mean(i))) * lit(w * scale)
        }
        dot.as(s"pc$c")
      }
      df.select(id.as("vec_id"), vec.as("__v"))
        .select(col("vec_id") +: cols: _*)
    }
  }

  /** Full PCA fit: the same exact integer Gram/mean sums (deterministic
    * at any parallelism), then a cyclic-Jacobi eigensolve of the centered
    * covariance on the driver — d×d is model-sized by contract. Returns
    * the top `k` eigenpairs, components sign-fixed (largest-|w| entry
    * positive) so the model is unique. */
  def fit(df: DataFrame, vec: Column, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val g = graft.Lineage.cutSmall(gramMicro(df, vec, dim)).collect()
    require(g.nonEmpty, "Pca.fit: empty input")
    val n = g.head.getLong(2).toDouble
    val sums = graft.Lineage.cutSmall(
      df.select(posexplode(vec).as(Seq("i", "x")))
        .groupBy("i").agg(sum(floor(col("x") * 1000000 + 0.5).cast("long"))
          .as("sm"))).collect()
    val mean = Array.ofDim[Double](dim)
    sums.foreach(r => mean(r.getInt(0)) = r.getLong(1) / 1000000.0 / n)
    val a = Array.ofDim[Double](dim, dim)
    g.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val cov = r.getLong(3) / 1000000.0 / n - mean(i) * mean(j)
      a(i)(j) = cov; a(j)(i) = cov
    }
    val (vals, vecs) = jacobiEigen(a)
    val order = vals.indices.sortBy(i => -vals(i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(r => vecs(r)(c))
      val m = v.maxBy(math.abs)
      if (m < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, comps, order.map(vals).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: rotations
    * zero each off-diagonal pair, sweeps until the off-diagonal mass is
    * below tolerance. O(d³) per sweep — fine for the model-sized d this
    * operator accepts. Returns (eigenvalues, eigenvector COLUMNS). */
  private[operators] def jacobiEigen(m: Array[Array[Double]],
                                     tol: Double = 1e-12,
                                     maxSweeps: Int = 64):
      (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > tol && sweep < maxSweeps) {
      for (p <- 0 until d - 1; q <- p + 1 until d if math.abs(a(p)(q)) > tol / (d * d)) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val cos = 1.0 / math.sqrt(t * t + 1.0)
        val sin = t * cos
        for (i <- 0 until d) {
          val (aip, aiq) = (a(i)(p), a(i)(q))
          a(i)(p) = cos * aip - sin * aiq
          a(i)(q) = sin * aip + cos * aiq
        }
        for (i <- 0 until d) {
          val (api, aqi) = (a(p)(i), a(q)(i))
          a(p)(i) = cos * api - sin * aqi
          a(q)(i) = sin * api + cos * aqi
        }
        for (i <- 0 until d) {
          val (vip, viq) = (v(i)(p), v(i)(q))
          v(i)(p) = cos * vip - sin * viq
          v(i)(q) = sin * vip + cos * viq
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    if (off > tol) throw new IllegalStateException(
      s"jacobiEigen: no convergence after $maxSweeps sweeps (off=$off)")
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }
}
