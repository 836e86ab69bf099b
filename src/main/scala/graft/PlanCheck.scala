package graft

import org.apache.spark.sql.SparkSession

/** Prints physical plans for representative queries — used to audit
  * pushdown/pruning/join strategy choices (not part of the driver contract). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s1_scan_project", "j1_equi_join", "a3_group_sum", "t1_topk",
        "d3_minhash_lsh", "v2_cosine_topk")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // size-gated plan choices (broadcast hints) depend on the actual
    // input, so the audit dir is selectable: a 100× replica shows the
    // post-gate plan a production corpus would get
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
