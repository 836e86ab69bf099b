package graft

/** Regenerates the pinned-model golden fixtures behind the
  * `pipe_{events,flow,dns,proxy}_golden` gates: ONE seeded training run
  * per pipeline on the sf0.01 harness tables
  * ([[graft.queries.PipelineQueries.goldenRuns]]), each scored top-100
  * committed as a TSV resource. The gates then hash-compare every FRESH
  * train+score against these files — the lock the no-SQL-twin LDA quartet
  * lacked: the perplexity band bounds training QUALITY and the
  * determinism gate pins same-process repeatability, but only a committed
  * golden output catches a silent cross-version behavior change in the
  * optimizer (MLlib upgrade, default hyperparameter drift) that still
  * lands inside the band. Scores render via Double.toString (shortest
  * roundtrip), so the comparison is bit-exact.
  *
  * Training pins a core-count-independent layout
  * ([[graft.ml.TopicModel.TrainLayoutPartitions]]), so the fixtures are
  * valid under any `SPARK_GRAFT_CPUS` — regenerate once, verify under
  * BOTH local[4] and the driver's local[32] before committing (the r9
  * lesson: a fixture generated under one session config and verified
  * only there pins the config, not the behavior).
  *
  * Run after any INTENDED change to training semantics, then commit the
  * diff: `tools/run.sh graft.GoldenGen`. An unintended diff here is the
  * regression the gates exist to catch — investigate, don't regenerate.
  */
object GoldenGen {
  val FixtureDir = "src/main/resources/graft/fixtures/golden"

  /** Canonical TSV rendering of one scored row (shared with the gates). */
  def line(r: org.apache.spark.sql.Row): String =
    (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("\t")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.fromEnv()
    graft.queries.PipelineQueries.goldenRuns.toSeq.sortBy(_._1)
      .foreach { case (name, run) =>
        val rows = run(spark, "/root/testdata/sf0.01").collect()
        val out = java.nio.file.Paths.get(s"$FixtureDir/$name.tsv")
        java.nio.file.Files.createDirectories(out.getParent)
        java.nio.file.Files.writeString(out,
          rows.map(line).mkString("", "\n", "\n"))
        println(s"wrote ${rows.length} golden rows to $out")
      }
    spark.stop()
  }
}
