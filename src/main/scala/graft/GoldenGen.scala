package graft

import graft.pipelines.EventsPipeline

/** Regenerates the pinned-model golden fixture behind the
  * `pipe_events_golden` gate: ONE seeded training run of the events
  * pipeline on the sf0.01 harness table, its scored top-100 committed as
  * a TSV resource. The gate then hash-compares every FRESH train+score
  * against this file — the lock the no-SQL-twin LDA quartet lacked: the
  * perplexity band bounds training QUALITY and the determinism gate pins
  * same-process repeatability, but only a committed golden output
  * catches a silent cross-version behavior change in the optimizer
  * (MLlib upgrade, default hyperparameter drift) that still lands inside
  * the band. Scores render via Double.toString (shortest roundtrip), so
  * the comparison is bit-exact.
  *
  * Run after any INTENDED change to training semantics, then commit the
  * diff: `tools/run.sh graft.GoldenGen`. An unintended diff here is the
  * regression the gate exists to catch — investigate, don't regenerate.
  */
object GoldenGen {
  val FixturePath =
    "src/main/resources/graft/fixtures/golden/pipe_events_sf001.tsv"

  /** Canonical TSV rendering of one scored row (shared with the gate). */
  def line(r: org.apache.spark.sql.Row): String =
    (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("\t")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.fromEnv()
    val events = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val rows = EventsPipeline.runChecked(events,
      threshold = 1.0, topK = 100, topicCount = 10).collect()
    val out = java.nio.file.Paths.get(FixturePath)
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out,
      rows.map(line).mkString("", "\n", "\n"))
    println(s"wrote ${rows.length} golden rows to $FixturePath")
    spark.stop()
  }
}
