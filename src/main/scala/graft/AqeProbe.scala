package graft
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.fromEnv(defaultCores = "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$tag%-28s ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    args.foreach { n =>
      (1 to 3).foreach { i =>
        time(s"$n rep$i") {
          SparkEntry.queries(n)(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
