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

  "Layout.zValue" should "interleave bits exactly and reject out-of-range inputs" in {
    import graft.operators.Layout
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum
    val rnd = new scala.util.Random(5)
    val pts = (1 to 200).map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => z shouldBe ref(x, y) }
    val ex = intercept[Exception] {
      Seq((70000L, 1L)).toDF("x", "y")
        .select(Layout.zValue(col("x"), col("y"))).collect()
    }
    Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("zValue"))) shouldBe true
  }

  "Layout.zOrderWrite" should "prune more files than a one-column sort on a 2-D box scan" in {
    import graft.operators.Layout
    // uniform 100×100 grid; the box predicate is narrow in y and wide in
    // x — the adversarial case for an x-sorted layout (every file spans
    // all of y, so nothing skips)
    val grid = for { x <- 0 until 100; y <- 0 until 100 }
      yield (x.toLong, y.toLong, x * 100L + y)
    val df = grid.toDF("x", "y", "payload")
    val zDir = Files.createTempDirectory("zord").toFile.getAbsolutePath + "/t"
    val linDir = Files.createTempDirectory("lin").toFile.getAbsolutePath + "/t"
    Layout.zOrderWrite(df, zDir, col("x"), col("y"), bits = 7, numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(linDir)

    // file-level min/max footer boxes — the stats any engine prunes by
    def hitFiles(dir: String): Int = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      files.count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        val (x0, x1, y0, y1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        // box: full x, y in [40, 49]
        !(y1 < 40L || y0 > 49L) && !(x1 < 0L || x0 > 99L)
      }
    }
    val zHits = hitFiles(zDir)
    val linHits = hitFiles(linDir)
    linHits shouldBe 16 // x-sorted files all span the y slice
    zHits should be < 8 // z-clustered files cover tight rectangles
    // correctness unchanged by layout
    spark.read.parquet(zDir).where(col("y") >= 40 && col("y") <= 49).count() shouldBe
      spark.read.parquet(linDir).where(col("y") >= 40 && col("y") <= 49).count()
  }

  "Layout.fileStats/prunedRead" should "cut the file list from the manifest and keep rows exact" in {
    import graft.operators.Layout
    val grid = for { x <- 0 until 100; y <- 0 until 100 }
      yield (x.toLong, y.toLong, x * 100L + y)
    val df = grid.toDF("x", "y", "payload")
    val dir = Files.createTempDirectory("mani").toFile.getAbsolutePath + "/t"
    Layout.zOrderWrite(df, dir, col("x"), col("y"), bits = 7, numFiles = 16)
    val manifest = Layout.fileStats(spark, dir, Seq("x", "y"))
    manifest.count() shouldBe 16
    manifest.columns.toSeq shouldBe Seq("file", "min_x", "max_x", "min_y", "max_y")
    // the manifest IS the per-file footer stats
    manifest.agg(min("min_x"), max("max_x"), min("min_y"), max("max_y"))
      .as[(Long, Long, Long, Long)].head() shouldBe ((0L, 99L, 0L, 99L))

    val (scan, nSel, nTot) = Layout.prunedRead(spark, dir, manifest,
      Map("x" -> (20L, 29L), "y" -> (40L, 49L)))
    nTot shouldBe 16L
    nSel should be < 8L // tight z rectangles: the box hits few files
    // row set identical to the unpruned filter (residual still applied)
    scan.select("x", "y", "payload").as[(Long, Long, Long)].collect().sorted shouldBe
      df.where(col("x").between(20, 29) && col("y").between(40, 49))
        .as[(Long, Long, Long)].collect().sorted
    // a box outside the data selects zero files and returns zero rows
    val (empty, n0, _) = Layout.prunedRead(spark, dir, manifest,
      Map("x" -> (500L, 600L), "y" -> (0L, 99L)))
    n0 shouldBe 0L
    empty.count() shouldBe 0L
  }

  "Layout.compact" should "collapse a fragmented directory without touching a row" in {
    val frag = Files.createTempDirectory("frag").toFile.getAbsolutePath
    val out = Files.createTempDirectory("compacted").toFile.getAbsolutePath
    val df = (1 to 5000).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    df.repartition(40).write.mode("overwrite").parquet(frag)
    val (nIn, nOut, bytes) = graft.operators.Layout.compact(
      spark, frag, out, targetBytes = 1L << 20)
    nIn shouldBe 40L
    nOut shouldBe 1L // 5k tiny rows fit one 1 MiB target file
    bytes should be > 0L
    spark.read.parquet(out).as[(Long, String)].collect().sortBy(_._1) shouldBe
      (1 to 5000).map(i => (i.toLong, s"p$i"))
  }

  it should "honor the maxFiles cap" in {
    val frag = Files.createTempDirectory("frag2").toFile.getAbsolutePath
    val out = Files.createTempDirectory("compacted2").toFile.getAbsolutePath
    (1 to 1000).map(i => (i.toLong, "x" * 2000)).toDF("id", "payload")
      .repartition(30).write.mode("overwrite").parquet(frag)
    // tiny target would want many output files; the cap wins
    val (_, nOut, _) = graft.operators.Layout.compact(
      spark, frag, out, targetBytes = 1L << 20, maxFiles = Some(2))
    nOut should be <= 2L
  }
}
