package graft

import graft.pipelines.EventsPipeline
import org.apache.spark.sql.functions.col

/** Measures the LDA-fit cost curve across `layoutPartitions` values on
  * one corpus — the evidence for the crawl-scale layout lever (r11 item
  * 5). Every pipeline is fit-bound, and the trainer pins its input to a
  * constant hash layout for reproducibility ([[graft.ml.TopicModel
  * .TrainLayoutPartitions]]); this probe shows what the WIDTH of that
  * layout costs/buys at a given core count: fit time should fall as the
  * layout approaches the session's parallelism and rise past it (EM's
  * per-iteration scheduling + aggregation tree scales with partition
  * count once cores are saturated). On a real cluster the same curve
  * shifts right with the executor count — the knob exists so the fit
  * point can follow it.
  *
  * Usage: LayoutProbe <sfDir> [widths] (default 16,32,64,128,256) —
  * honors SPARK_GRAFT_CPUS like every other main.
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val widths = if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
                 else Seq(16, 32, 64, 128, 256)
    val spark = GraftSession.fromEnv(defaultCores = "32")
    val events = Tables.load(spark, sfDir, "events")
    val cuts = EventsPipeline.computeCuts(events)
    val wc = graft.operators.Corpus.wordCounts(
      EventsPipeline.featurize(events, cuts), col("user_id"), col("word"))
      .cache()
    wc.count() // materialize once: every width times the FIT, not the scan
    // one untimed warmup fit absorbs JIT/classloading
    graft.ml.TopicModel.train(wc, topicCount = 10, maxIter = 10,
      layoutPartitions = widths.head)
    val results = widths.map { w =>
      val t0 = System.nanoTime()
      graft.ml.TopicModel.train(wc, topicCount = 10, maxIter = 10,
        layoutPartitions = w)
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[layout] width=$w%4d  fit=$dt%7.2f s")
      f""""$w":$dt%.3f"""
    }
    println(s"""{"probe":"lda_layout","sf":"$sfDir","cores":"${
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}","fit_sec":{${
      results.mkString(",")}}}""")
    spark.stop()
  }
}
