package graft

import graft.pipelines.EventsPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are materialized through the noop sink so
  * every expression is fully evaluated (a bare count() would let Catalyst
  * prune the projected expressions away and time only the scan). */
object Bench {

  /** Representative subset: one per operator family, plus the full
    * train+score pipeline. */
  private val headline = Seq(
    "s1_scan_project", "p2_range_predicate", "j1_equi_join", "j4_semi_join",
    "a1_group_count", "a3_group_sum", "a6_ecdf", "t1_topk",
    "w1_window_cumsum", "g1_rollup", "f3_bin", "f4_entropy", "f8_flow_words",
    "x2_quality", "x3_langid", "x11b_pack_concat", "x12_class_balance",
    "x13_top_ngrams", "c2_gopher_rules", "d7_dup_spans",
    "w3_sessionize", "d1_exact_dedup", "d2_ngram_jaccard",
    "d3_minhash_lsh", "d4_simhash", "d6_near_dup_clusters",
    "d8_retain_best", "d9_simhash_pairs", "d10_incremental_lsh",
    "x14_mixture", "x15_cluster_split", "x7b_fuzzy_decontaminate",
    "x16_lm_score", "x17_dsir_select", "x18_c4_filter", "x19_span_removal",
    "x20_line_dedup", "x21_temperature_mix", "x22_normalize",
    "x23_shuffle_shards", "x24_pseudonymize", "x25_bpe_train",
    "x26_bpe_encode", "v1_norm",
    "v2_cosine_topk", "v3_ivf_assign", "v4b_cell_near_dup",
    "v4c_scaled_cells", "v6b_lsh_scaled", "v7_kmeans", "v8b_pq_train",
    "v8_pq_encode", "v9_pq_adc", "v11_ivfpq", "v11b_ivfpq_indexed",
    "v12_ann_recall", "v13_random_project",
    "v10_semantic_dedup", "c1_curation", "j7_asof_join",
    "pipe_events_fixedmodel")

  /** Concurrent heavyweight processes (other JVMs, DuckDB oracles) — the
    * round-4 bench artifact was measured alongside still-streaming oracle
    * jobs and its medians disagreed with idle-machine re-runs by 5-25×.
    * Anything java/duckdb/pyspark outside this process's own ancestor
    * chain (sbt, the driver) counts as a contender. */
  private def contenders(): Seq[String] = {
    val anc = collection.mutable.Set[Long]()
    var cur: java.util.Optional[ProcessHandle] =
      java.util.Optional.of(ProcessHandle.current())
    while (cur.isPresent) { anc += cur.get.pid(); cur = cur.get.parent() }
    val out = collection.mutable.ArrayBuffer[String]()
    val procs = Option(new java.io.File("/proc").listFiles())
      .getOrElse(Array.empty)
    procs.foreach { f =>
      if (f.getName.nonEmpty && f.getName.forall(_.isDigit)) {
        val pid = f.getName.toLong
        if (!anc.contains(pid)) {
          try {
            val cmd = new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(s"/proc/$pid/cmdline")))
              .replace('\u0000', ' ').trim
            val exe = cmd.split(' ').headOption.getOrElse("")
            if (exe.endsWith("java") || cmd.contains("duckdb") ||
                cmd.contains("pyspark"))
              out += s"$pid ${cmd.take(60)}"
          } catch { case _: Throwable => } // raced exit; not a contender
        }
      }
    }
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Large-replica scale runs: skip entries whose cost model is already
    // documented (v4b's deliberate n²/k) and drop the rep count — medians
    // matter at 1-6 s where JVM noise is comparable, not at 100+ s. Both
    // knobs default to the driver contract (no skips, 3 reps); a skipped
    // query is absent from the JSON, never silently fast.
    val skip = sys.env.get("SPARK_GRAFT_BENCH_SKIP")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // SPARK_GRAFT_BENCH_ONLY: comma list — time ONLY these queries (for
    // targeted scale points, e.g. v9 vs v11 growth curves, without paying
    // for the whole suite at a large replica). Composes with SKIP.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(3)
    // Contention guard: medians timed next to another Spark JVM or a
    // DuckDB oracle run are not comparable to idle-machine numbers (r4's
    // artifact was off 5-25×). Default = run anyway but stamp the JSON
    // "contended": true with the process list; SPARK_GRAFT_BENCH_STRICT=1
    // refuses outright so a scripted run can't record a poisoned artifact.
    val contendersAtStart = contenders()
    if (contendersAtStart.nonEmpty) {
      System.err.println(s"[bench] WARNING: concurrent heavyweight processes:")
      contendersAtStart.foreach(c => System.err.println(s"[bench]   $c"))
      if (sys.env.get("SPARK_GRAFT_BENCH_STRICT").contains("1")) {
        System.err.println("[bench] SPARK_GRAFT_BENCH_STRICT=1 — refusing to run")
        sys.exit(2)
      }
    }
    val spark = GraftSession.fromEnv(defaultCores = "32")

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Untimed warmup: touch every table once and run one tiny shuffle so
    // JIT/classloading/scan setup don't land on the first timed query.
    Seq("lineitem", "orders", "customer", "part", "supplier", "nation",
      "region", "events", "documents", "embeddings").foreach { t =>
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => }
    }
    spark.range(1000).groupBy((org.apache.spark.sql.functions.col("id") % 7)
      .as("k")).count().write.format("noop").mode("overwrite").save()

    // EVERY query is timed 3× and reports its MEDIAN — single-run numbers
    // proved unusable round-over-round (shared-JVM/GC noise produced
    // 1.4-4.9× phantom swings on 1-6 s queries); the min/max spread is
    // emitted alongside so a regression can be told from noise.
    val timed = collection.mutable.LinkedHashMap[String, Double]()
    val spread = collection.mutable.LinkedHashMap[String, (Double, Double)]()
    def timeOnce(name: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try { body; (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0 // explicit failure marker, not a fast success
      }
    }
    // Each rep runs in a checkpoint scope: operators localCheckpoint their
    // intermediates, and without the scope those blocks outlive the query
    // and poison later entries' GC (the r4 suite-position effect). The
    // unpersist itself is untimed (after the rep's clock stops).
    def time(name: String)(body: => Unit): Unit = {
      if (skip(name) || only.exists(!_.contains(name))) {
        System.err.println(s"[bench] $name skipped"); return
      }
      val ts = Seq.fill(reps) {
        var t = -1.0
        CheckpointScope.withScope(spark) { t = timeOnce(name)(body) }
        t
      }
      if (ts.contains(-1.0)) {
        timed(name) = -1.0
        spread(name) = (-1.0, -1.0)
      } else {
        val sorted = ts.sorted
        timed(name) = sorted(reps / 2)
        spread(name) = (sorted.head, sorted.last)
      }
    }

    // pipeline_events diagnostics (r3 showed a 12.3 s vs 5.8 s same-round
    // swing on this one entry): the pipeline runs at the suite's FIRST
    // position (pipeline_events_first, in `stages`) and at its usual LAST
    // position (pipeline_events, in `queries`, keys unchanged vs r3), so a
    // suite-position/JVM-state effect is measured instead of guessed; the
    // stage map then splits the time into cuts / featurize+corpus /
    // lda.fit / score+topk.
    def pipelineEvents(): Unit =
      run(EventsPipeline.run(Tables.load(spark, sfDir, "events"),
        threshold = 1.0, topK = 100, topicCount = 10))

    val stages = collection.mutable.LinkedHashMap[String, Double]()
    def timeStage(name: String)(body: => Unit): Unit = {
      if (skip(name) || only.exists(!_.contains(name))) {
        System.err.println(s"[bench] $name skipped"); return
      }
      val ts = Seq.fill(reps)(timeOnce(name)(body))
      stages(name) = if (ts.contains(-1.0)) -1.0 else ts.sorted.apply(reps / 2)
      spread(name) = if (ts.contains(-1.0)) (-1.0, -1.0)
        else (ts.min, ts.max)
    }

    timeStage("pipeline_events_first") { pipelineEvents() }

    headline.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        time(name) { run(fn(spark, sfDir)) }
      }
    }
    // Full suspicious-connects pipeline (featurize → LDA → score → top-k),
    // with exact reference-semantics cuts and with the sketch-based cuts
    // (the high-cardinality scale path).
    time("pipeline_events") { pipelineEvents() }
    time("pipeline_events_approx") {
      run(EventsPipeline.run(Tables.load(spark, sfDir, "events"),
        threshold = 1.0, topK = 100, topicCount = 10, exactCuts = false))
    }

    // Stage split, median-of-3 each, on the same inputs the pipeline uses.
    val events = Tables.load(spark, sfDir, "events")
    timeStage("pe_stage_cuts") { EventsPipeline.computeCuts(events) }
    val cuts = EventsPipeline.computeCuts(events)
    timeStage("pe_stage_featurize") {
      run(graft.operators.Corpus.wordCounts(
        EventsPipeline.featurize(events, cuts),
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("word")))
    }
    val wc = graft.operators.Corpus.wordCounts(
      EventsPipeline.featurize(events, cuts),
      org.apache.spark.sql.functions.col("user_id"),
      org.apache.spark.sql.functions.col("word"))
    var model: graft.ml.TopicModel.Model = null
    timeStage("pe_stage_lda_fit") {
      model = graft.ml.TopicModel.train(wc, topicCount = 10, maxIter = 10)
    }
    val emodel = EventsPipeline.Model(cuts, model, 10)
    timeStage("pe_stage_score") {
      run(graft.operators.Scoring.suspicious(
        EventsPipeline.score(events, emodel)
          .select("event_id", "user_id", "event_type", "word", "score"),
        threshold = 1.0, topK = 100,
        tiebreak = Seq(org.apache.spark.sql.functions.col("event_id"))))
    }

    val qs = timed.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val st = stages.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val sp = spread.map { case (k, (lo, hi)) => "\"" + k + f"\":[$lo%.3f,$hi%.3f]" }
      .mkString("{", ",", "}")
    val total = timed.values.sum
    // re-check at the end: a contender that appeared mid-run also taints
    val allContenders = (contendersAtStart ++ contenders()).distinct
    val contended = if (allContenders.isEmpty) "" else {
      val list = allContenders.map(c => "\"" + c.replace("\\", "\\\\")
        .replace("\"", "\\\"") + "\"").mkString("[", ",", "]")
      s""","contended":true,"contenders":$list"""
    }
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_reps":$reps,"queries":$qs,"stages":$st,"spread":$sp$contended,"sf":"$sfDir"}"""
    // The driver's per-round artifact keeps only the LAST 2000 chars of
    // stdout (r5's tail cut the line's head off → "parsed": null in r3,
    // r4 AND r5). stdout therefore gets a COMPACT line — medians and the
    // contention stamp, no stages/spread — sized to survive the window
    // (~1.45 KB at 51 queries) with sbt's trailing "[success]" line after
    // it; the FULL record (stages, spreads) is the BENCH_LOCAL.json file.
    val compact = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_reps":$reps,"queries":$qs$contended,"sf":"$sfDir"}"""
    println(compact)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), json + "\n")
    spark.stop()
  }
}
