package graft

import org.apache.spark.sql.functions._

/** Stage-timeline probe for `d12_prefix_jaccard` (not part of the driver
  * contract): the sf0.1 fixture's tiny (median-25-token) templated docs
  * give the prefix index one 3,816-doc bucket → 22 M raw matches → 3.7 M
  * surviving candidates, and the gate measured 39-48 s. This probe times
  * each stage of [[graft.operators.Dedup.prefixJaccardPairs]] separately
  * — token explode + df, prefix build, candidate join + distinct, exact
  * verify — so the dominant stage is measured, not guessed. One JSON
  * line on stdout.
  *
  * Usage: runMain graft.D12Probe <sfDir> [thresholdMilli]
  */
object D12Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tm = args.lift(1).map(_.toLong).getOrElse(900L)
    val spark = GraftSession.fromEnv(defaultCores = "32")
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
        explode(array_distinct(graft.functions.TextFunctions.tokens(col("text")))).as("tok"))
      .localCheckpoint(false)
    val (nTok, tTok) = timed(toks.count())
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("s"))
    val pref = toks.join(dfreq, "tok")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("df").asc, col("tok").asc)))
      .join(sizes, "doc_id")
      .where(col("rank") <= col("s") - expr(s"(s * $tm + 999) div 1000") + 1)
      .select("doc_id", "tok", "s")
      .localCheckpoint(false)
    val (nPref, tPref) = timed(pref.count())
    val cand = pref.as("a").join(pref.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.s").as("n_a"), col("b.s").as("n_b"))
      .where(greatest(col("n_a"), col("n_b")) * tm <=
        least(col("n_a"), col("n_b")) * 1000L)
      .distinct()
      .localCheckpoint(false)
    val (nCand, tCand) = timed(cand.count())
    val sets = toks.groupBy("doc_id").agg(collect_list(col("tok")).as("tks"))
    val est = sets.queryExecution.optimizedPlan.stats.sizeInBytes
    val verified = cand
      .join(graft.operators.Scoring.sizeGatedBroadcast(sets, 256L << 20)
        .select(col("doc_id").as("id_a"), col("tks").as("tks_a")), "id_a")
      .join(graft.operators.Scoring.sizeGatedBroadcast(sets, 256L << 20)
        .select(col("doc_id").as("id_b"), col("tks").as("tks_b")), "id_b")
      .withColumn("c", size(array_intersect(col("tks_a"), col("tks_b"))).cast("long"))
      .where(col("c") * 1000L >= lit(tm) * (col("n_a") + col("n_b") - col("c")))
    val (nOut, tVer) = timed(verified.count())
    // Variant bisect: composed-with-pref-checkpoint (pc) and
    // composed-with-cand-checkpoint (cc). These deliberately rebuild the
    // PRE-FIX operator shape (no stream-side repartition) — they are the
    // measured evidence for the AQE-coalesce pathology the operator now
    // guards against: AQE sees the 14 k-row prefix shuffle, coalesces to
    // one post-shuffle partition, and the 22 M-match bucket self-join
    // plus verify runs as a single 45 s task (cc). Checkpointing pref
    // (pc) hides it by accident; the operator's explicit repartition
    // fixes it by design.
    def verify(c: org.apache.spark.sql.DataFrame) = c
      .join(graft.operators.Scoring.sizeGatedBroadcast(sets, 256L << 20)
        .select(col("doc_id").as("id_a"), col("tks").as("tks_a")), "id_a")
      .join(graft.operators.Scoring.sizeGatedBroadcast(sets, 256L << 20)
        .select(col("doc_id").as("id_b"), col("tks").as("tks_b")), "id_b")
      .withColumn("c", size(array_intersect(col("tks_a"), col("tks_b"))).cast("long"))
      .where(col("c") * 1000L >= lit(tm) * (col("n_a") + col("n_b") - col("c")))
    def candFrom(p: org.apache.spark.sql.DataFrame) = p.as("a").join(p.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.s").as("n_a"), col("b.s").as("n_b"))
      .where(greatest(col("n_a"), col("n_b")) * tm <=
        least(col("n_a"), col("n_b")) * 1000L)
      .distinct()
    val prefRaw = toks.join(dfreq, "tok")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("df").asc, col("tok").asc)))
      .join(sizes, "doc_id")
      .where(col("rank") <= col("s") - expr(s"(s * $tm + 999) div 1000") + 1)
      .select("doc_id", "tok", "s")
    val (nPc, tPc) = timed(verify(candFrom(prefRaw.localCheckpoint(false))).count())
    val stages = collection.mutable.ArrayBuffer[(Int, Int, Long, Long)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId, si.numTasks,
          si.taskMetrics.executorRunTime, si.taskMetrics.executorCpuTime / 1000000))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val (nCc, tCc) = timed(verify(candFrom(prefRaw).localCheckpoint(false)).count())
    spark.sparkContext.removeSparkListener(listener)
    stages.sortBy(-_._3).take(8).foreach { case (id, nt, rt, cpu) =>
      System.err.println(s"[d12-stage] id=$id tasks=$nt runMs=$rt cpuMs=$cpu") }

    // end-to-end: the composed operator exactly as the gate runs it
    val full = graft.operators.Dedup.prefixJaccardPairs(docs, col("doc_id"),
      col("text"), thresholdMilli = tm)
    if (sys.env.get("D12_EXPLAIN").contains("1"))
      System.err.println(full.queryExecution.executedPlan.toString.take(20000))
    val (nFull, tFull) = timed(full.count())
    System.err.println(s"[d12] pc=$tPc ($nPc) cc=$tCc ($nCc)")
    println(s"""{"n_tok":$nTok,"t_tok":$tTok,"n_pref":$nPref,"t_pref":$tPref,""" +
      s""""n_cand":$nCand,"t_cand":$tCand,"sets_estimate":$est,""" +
      s""""n_out":$nOut,"t_verify":$tVer,"n_full":$nFull,"t_full":$tFull}""")
    spark.stop()
  }
}
