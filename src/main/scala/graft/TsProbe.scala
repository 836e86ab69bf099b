package graft
import org.apache.spark.sql.SparkSession
object TsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    ev.printSchema()
    ev.selectExpr("event_id", "ts", "hour(ts) as h", "minute(ts) as m", "second(ts) as s").show(3, false)
    spark.stop()
  }
}
