package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all suites (mirrors the reference's
  * TestingSparkContext fixture: local master, 2 shuffle partitions —
  * reference: testutils/TestingSparkContext.scala:61-74). */
object SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .withExtensions(new GraftExtensions) // SQL functions under test too
    .getOrCreate()
}

abstract class SparkSpec extends AnyFlatSpec with Matchers {
  lazy val spark: SparkSession = {
    val s = SparkSpec.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
