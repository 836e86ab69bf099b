package graft

import org.apache.spark.sql.functions.col

/** Targeted BPE-training scale probe (not part of the driver contract):
  * trains `numMerges` merges on a replica corpus and prints one JSON line
  * with wall seconds — the measured evidence that
  * [[graft.operators.Bpe.trainMerges]]'s one-distributed-job +
  * bounded-collect + in-memory-training shape makes merge count a
  * non-factor at scale (the per-gate bench fixtures train too few merges
  * to show it).
  *
  * Usage: runMain graft.BpeProbe <sfDir> [numMerges]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = GraftSession.fromEnv(defaultCores = "32")
    val docs = Tables.load(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val merges = graft.operators.Bpe.trainMerges(docs, col("text"),
      numMerges = numMerges)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"bpe_train","value":$sec%.3f,"unit":"sec","merges":${merges.length},"requested":$numMerges,"sf":"$sfDir"}""")
    spark.stop()
  }
}
