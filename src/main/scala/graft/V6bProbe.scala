package graft

import org.apache.spark.sql.functions._

/** Targeted stage-timeline probe for `v6b_lsh_scaled`'s replica
  * superlinearity (not part of the driver contract): BENCH_100X r7
  * measured 296 s at 100× = 20.6× the 30× time on 3.3× the data, despite
  * the width rule + occupancy cap. This probe splits the operator into
  * its stages on a given dir and prints ONE JSON line per stage:
  * signature build, bucket-occupancy distribution (the Σ occ·(occ-1)/2
  * candidate budget the width rule is supposed to bound), salted
  * candidate generation + distinct, and the exact-cosine verify — so the
  * superlinear stage is measured, not guessed.
  *
  * Usage: runMain graft.V6bProbe <sfDir> [threshold] [targetOccupancy] [hammingMargin]
  * (the extra knobs measure the sparse-output regime: a higher threshold
  * plus a tighter occupancy target = more signature bits = candidates
  * limited to genuinely-agreeing groups)
  */
object V6bProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.35)
    val targetOccupancy = args.lift(2).map(_.toLong).getOrElse(16L)
    val hammingMargin = args.lift(3).map(_.toDouble).getOrElse(Double.NaN)
    val spark = GraftSession.fromEnv(defaultCores = "32")
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val emb = Tables.load(spark, sfDir, "embeddings")
    val (n, tCount) = timed(emb.count())
    val bits = (1 to 24).find(b => n <= (targetOccupancy << b)).getOrElse(24)
    val bands = 4

    // stage 1: signatures (same plane math as the operator)
    val v = emb.select(col("vec_id").cast("long").as("vid"),
      col("embedding").cast("array<double>").as("v"))
    val bandSigs = (0 until bands).map { b =>
      val sig = (0 until bits).map { r =>
        val j = b * bits + r
        val plane = array((0 until 64).map(d =>
          lit(graft.operators.Similarity.planeComponent(j, d, 64))): _*)
        when(graft.operators.Similarity.dot(col("v"), plane) > 0,
          lit(1L << r)).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(b).as("band"), sig.as("sig"))
    }
    val (banded, tBand) = timed {
      val bd = v.select(col("vid"), explode(array(bandSigs: _*)).as("bs"))
        .select(col("vid"), col("bs.band"), col("bs.sig"))
        .localCheckpoint(true)
      bd
    }

    // stage 2: occupancy distribution — the candidate budget
    val (occRow, tOcc) = timed {
      banded.groupBy("band", "sig").count()
        .agg(count(lit(1)).as("n_buckets"), max("count").as("max_occ"),
          sum((col("count") * (col("count") - 1) / 2).cast("long"))
            .as("cand_budget"),
          sum(when(col("count") > 64, 1L).otherwise(0L)).as("n_hot"),
          sum(when(col("count") > 64,
            (col("count") * (col("count") - 1) / 2).cast("long"))
            .otherwise(0L)).as("hot_cand"))
        .first()
    }

    // stage 3: salted candidate generation + distinct (operator-private
    // path replayed through the public API's candidate stage)
    val (candCounts, tCand) = timed {
      val sp = graft.operators.Similarity.saltedBandPairs(banded, 64L)
      val pre = sp.count()
      val post = sp.select("id_a", "id_b").distinct().count()
      (pre, post)
    }

    // stage 4: the full operator end-to-end (includes the verify join)
    val (nOut, tFull) = timed {
      graft.operators.Similarity.lshNearDupPairsScaled(
        emb, threshold = threshold, dim = 64, bands = 4,
        targetOccupancy = targetOccupancy, precomputedN = Some(n),
        hammingMargin = hammingMargin).count()
    }

    println(f"""{"metric":"v6b_probe","sf":"$sfDir","n":$n,"bits":$bits,""" +
      f""""threshold":$threshold,"target_occ":$targetOccupancy,""" +
      f""""hamming_margin":$hammingMargin,""" +
      f""""t_count":$tCount%.2f,"t_band":$tBand%.2f,"t_occ":$tOcc%.2f,""" +
      f""""n_buckets":${occRow.getLong(0)},"max_occ":${occRow.getLong(1)},""" +
      f""""cand_budget":${occRow.getLong(2)},"n_hot":${occRow.getLong(3)},""" +
      f""""hot_cand":${occRow.getLong(4)},""" +
      f""""cand_pre":${candCounts._1},"cand_post":${candCounts._2},""" +
      f""""t_cand":$tCand%.2f,"n_out":$nOut,"t_full":$tFull%.2f}""")
    spark.stop()
  }
}
