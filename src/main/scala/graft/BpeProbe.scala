package graft

import org.apache.spark.sql.functions.col

/** Targeted BPE-training scale probe (not part of the driver contract):
  * trains `numMerges` merges on a replica corpus and prints one JSON line
  * with wall seconds, merges trained, and the batched/sequential round
  * ratio — the measured evidence that [[graft.operators.Bpe.trainMerges]]'s
  * disjoint-batch rounds cut driver-coordinated latency ~batch× at
  * production merge counts (the per-gate bench fixtures train too few
  * merges to show the shape).
  *
  * Usage: runMain graft.BpeProbe <sfDir> [numMerges] [batch]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(256)
    val batch = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = GraftSession.fromEnv(defaultCores = "32")
    val docs = Tables.load(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val merges = graft.operators.Bpe.trainMerges(docs, col("text"),
      numMerges = numMerges, batch = batch)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"bpe_train","value":$sec%.3f,"unit":"sec","merges":${merges.length},"requested":$numMerges,"batch":$batch,"sf":"$sfDir"}""")
    spark.stop()
  }
}
