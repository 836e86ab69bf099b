package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partitioned-layout write + partition pruning (SURVEY.md §4: the
  * reference picked dated directories in shell; here `y=/m=/d=` layout is
  * written by the engine and Catalyst prunes partitions from filters). */
class PartitioningSpec extends SparkSpec {

  import spark.implicits._

  "writeParquet with partition columns" should "produce a prunable dated layout" in {
    val dir = Files.createTempDirectory("part").toFile.getAbsolutePath + "/t"
    val df = (1 to 200).map { i =>
      (i.toLong, 2024, 1 + i % 3, s"payload$i")
    }.toDF("id", "y", "m", "payload")
    Sinks.writeParquet(df, dir, partitionCols = Seq("y", "m"))

    new java.io.File(s"$dir/y=2024/m=2").exists() shouldBe true

    val back = spark.read.parquet(dir).where(col("m") === 2)
    back.count() shouldBe (1 to 200).count(i => 1 + i % 3 == 2)
    // the physical scan must prune to the single matching partition
    val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
    scan should include ("PartitionFilters")
    scan should include ("(m#")
  }

  "Tables.loadPaths" should "read every path, not just the first" in {
    val a = Files.createTempDirectory("pa").toFile.getAbsolutePath + "/a"
    val b = Files.createTempDirectory("pb").toFile.getAbsolutePath + "/b"
    Seq(1L, 2L).toDF("v").write.parquet(a)
    Seq(3L).toDF("v").write.parquet(b)
    Tables.loadPaths(spark, Seq(a, b)).as[Long].collect().sorted shouldBe
      Array(1L, 2L, 3L)
  }

  "loadPaths with a partition-pruned filter" should "skip non-matching files" in {
    val dir = Files.createTempDirectory("pp").toFile.getAbsolutePath + "/t"
    (1 to 100).map(i => (i, i % 4)).toDF("v", "d")
      .write.partitionBy("d").parquet(dir)
    val pruned = spark.read.parquet(dir).where(col("d") === 1)
    pruned.count() shouldBe 25
    pruned.queryExecution.executedPlan.collectLeaves().head.toString should
      include ("PartitionFilters: [isnotnull(d#")
  }
}
