package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic anisotropic cloud: dominant direction (3,1,0,0)/√10,
    * secondary (−1,3,0,0)/√10, tiny noise on dims 3/4 — no RNG, a fixed
    * trig lattice so the spec is reproducible byte-for-byte. */
  private def planted(n: Int) = {
    val s10 = math.sqrt(10.0)
    val u = Array(3.0 / s10, 1.0 / s10, 0.0, 0.0)
    val w = Array(-1.0 / s10, 3.0 / s10, 0.0, 0.0)
    (0 until n).map { i =>
      val a = 5.0 * math.sin(i * 0.7)       // big spread along u
      val b = 1.0 * math.cos(i * 1.3)       // smaller along w
      val e = Array(0.01 * math.sin(i * 2.1), 0.01 * math.cos(i * 3.7))
      (i.toLong, Seq(a * u(0) + b * w(0), a * u(1) + b * w(1),
        e(0), e(1)))
    }.toDF("vec_id", "embedding")
  }

  "Pca.gramMicro" should "match a brute-force fixed-point Gram" in {
    val rows = Seq(
      (1L, Seq(1.0, 2.0, -0.5)),
      (2L, Seq(0.25, -1.0, 3.0)),
      (3L, Seq(-2.0, 0.5, 0.125)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Pca.gramMicro(df, col("embedding"), dim = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    for (i <- 0 until 3; j <- i until 3) {
      val s = rows.map { case (_, v) =>
        math.floor(v(i) * v(j) * 1000000 + 0.5).toLong }.sum
      got((i.toLong, j.toLong)) shouldBe ((3L, s))
    }
    got.size shouldBe 6
  }

  "Pca.powerComponentMicro" should "converge to the dominant second-moment direction" in {
    val df = planted(200)
    val vm = Pca.powerComponentMicro(df, col("embedding"), dim = 4, iters = 12)
    val v = vm.map(_ / 1e6)
    math.sqrt(v.map(x => x * x).sum) shouldBe 1.0 +- 1e-5
    // dominant direction of the (uncentered) second moment is ±u
    val s10 = math.sqrt(10.0)
    val u = Array(3.0 / s10, 1.0 / s10, 0.0, 0.0)
    val cos = math.abs(v.zip(u).map { case (a, b) => a * b }.sum)
    cos shouldBe 1.0 +- 1e-3
  }

  "Pca.projectMicro" should "compute the ordered-fold dot with the micro component" in {
    val df = Seq((9L, Seq(1.0, -2.0, 0.5, 4.0))).toDF("vec_id", "embedding")
    val vm = Array(500000L, -250000L, 1000000L, 0L)
    val got = Pca.projectMicro(df, col("vec_id"), col("embedding"), vm)
      .as[(Long, Double)].head()
    val exp = 1.0 * 0.5 + -2.0 * -0.25 + 0.5 * 1.0 + 4.0 * 0.0
    got shouldBe ((9L, math.floor(exp * 1000000 + 0.5) / 1000000.0))
  }

  "Pca.fit" should "recover planted components with eigen residuals near zero" in {
    val df = planted(400)
    val m = Pca.fit(df, col("embedding"), dim = 4, k = 4)
    // eigenvalues descending
    m.eigenvalues.sliding(2).foreach { case Array(a, b) => a should be >= b }
    // components orthonormal
    for (a <- m.components.indices; b <- a until m.components.length) {
      val dot = m.components(a).zip(m.components(b)).map(p => p._1 * p._2).sum
      dot shouldBe (if (a == b) 1.0 else 0.0) +- 1e-9
    }
    // top component is the planted dominant direction (centered data:
    // sin/cos lattices have near-zero mean, so covariance ≈ second moment)
    val s10 = math.sqrt(10.0)
    val u = Array(3.0 / s10, 1.0 / s10, 0.0, 0.0)
    val cos = math.abs(m.components(0).zip(u).map(p => p._1 * p._2).sum)
    cos shouldBe 1.0 +- 1e-2
    // explained variance concentrates on the two planted directions
    val total = m.eigenvalues.sum
    (m.eigenvalues(0) + m.eigenvalues(1)) / total should be > 0.999
  }

  it should "produce eigenpairs satisfying C v = lambda v" in {
    val df = planted(100)
    // rebuild the exact covariance the fit used, from the same micro sums
    val g = Pca.gramMicro(df, col("embedding"), dim = 4)
      .as[(Long, Long, Long, Long)].collect()
    val n = g.head._3.toDouble
    val sums = df.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(sum(floor(col("x") * 1000000 + 0.5).cast("long")).as("s"))
      .as[(Int, Long)].collect().toMap
    val mean = Array.tabulate(4)(i => sums(i) / 1e6 / n)
    val c = Array.ofDim[Double](4, 4)
    g.foreach { case (i, j, _, s) =>
      val v = s / 1e6 / n - mean(i.toInt) * mean(j.toInt)
      c(i.toInt)(j.toInt) = v; c(j.toInt)(i.toInt) = v
    }
    val m = Pca.fit(df, col("embedding"), dim = 4, k = 4)
    for (k <- 0 until 4) {
      val v = m.components(k)
      val cv = Array.tabulate(4)(i => (0 until 4).map(j => c(i)(j) * v(j)).sum)
      val res = cv.zip(v).map { case (a, b) => a - m.eigenvalues(k) * b }
      res.map(math.abs).max should be < 1e-8
    }
  }

  it should "whiten projections to unit per-component variance" in {
    val df = planted(200)
    val m = Pca.fit(df, col("embedding"), dim = 4, k = 2)
    val w = m.transform(df, col("vec_id"), col("embedding"), k = 2,
      whiten = true).as[(Long, Double, Double)].collect()
    def popVar(xs: Array[Double]): Double = {
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    // fit's covariance is the population covariance of these same rows
    // (up to the 1e-6 fixed-point Gram), so whitened variance ≈ 1
    popVar(w.map(_._2)) shouldBe 1.0 +- 1e-3
    popVar(w.map(_._3)) shouldBe 1.0 +- 1e-3
  }

  "PcaModel.transform" should "project centered vectors onto the top components" in {
    val df = planted(50)
    val m = Pca.fit(df, col("embedding"), dim = 4, k = 2)
    val got = m.transform(df, col("vec_id"), col("embedding"), k = 2)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val raw = planted(50).as[(Long, Seq[Double])].collect().sortBy(_._1)
    got.zip(raw).foreach { case ((_, p0, p1), (_, x)) =>
      val c = x.toArray.zip(m.mean).map(p => p._1 - p._2)
      p0 shouldBe c.zip(m.components(0)).map(p => p._1 * p._2).sum +- 1e-9
      p1 shouldBe c.zip(m.components(1)).map(p => p._1 * p._2).sum +- 1e-9
    }
  }
}
