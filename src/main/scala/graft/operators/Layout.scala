package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers beyond partitioning/bucketing: multi-dimension
  * data clustering for scan pruning.
  *
  * A 100 TB table filtered on TWO columns can only be partition-pruned on
  * one of them; Z-order curve clustering (Morton order — the interleaved
  * bit curve Delta/Iceberg expose as OPTIMIZE ZORDER) sorts rows so that
  * files stay tight in BOTH dimensions at once: every file's min/max
  * footer box covers a small rectangle of the (x, y) plane, and a box
  * predicate skips every non-intersecting file. The curve value is pure
  * integer bit arithmetic — a codegen'd column expression here, and the
  * same closed form an external engine can replay.
  */
object Layout {

  /** Morton/Z-value of two non-negative ints, each < 2^bits: bit i of x
    * lands at position 2i, bit i of y at 2i+1. Pure shift/mask column
    * arithmetic (whole-stage codegen, no UDF); out-of-range inputs
    * raise loudly rather than silently folding into a wrong curve
    * position. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    val bound = 1L << bits
    def guarded(c: Column) =
      when(c < 0 || c >= bound, raise_error(concat(
        lit(s"zValue input out of [0, $bound): "), c.cast("string"))))
        .otherwise(c.cast("long"))
    val gx = guarded(x)
    val gy = guarded(y)
    (0 until bits).map { i =>
      (shiftleft(shiftright(gx, i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(gy, i).bitwiseAND(1L), 2 * i + 1)): Column
    }.reduce(_ + _)
  }

  /** Z-order clustered parquet write: range-partition by the curve value
    * (each of `numFiles` output files owns a contiguous z-range = a tight
    * (x, y) rectangle), sort within files so row groups nest the same
    * way, drop the helper column, write. One shuffle — the exact cost of
    * any clustered rewrite; downstream two-column box scans then prune
    * by file/row-group min-max footers instead of reading everything. */
  def zOrderWrite(df: DataFrame, path: String, x: Column, y: Column,
                  bits: Int = 16, numFiles: Int = 16): Unit =
    df.withColumn("_zval", zValue(x, y, bits))
      .repartitionByRange(numFiles, col("_zval"))
      .sortWithinPartitions("_zval")
      .drop("_zval")
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max stats manifest over a parquet directory — the
    * Iceberg/Delta manifest pattern: ONE scan at layout time produces a
    * (file, min_c1, max_c1, min_c2, max_c2, …) frame of `numFiles` rows,
    * and every later box query prunes its file LIST against it instead
    * of opening footers. Column order in the output: `file`, then
    * min_/max_ per stat column in the given order. The aggregation is
    * map-side-partial over file-aligned partitions, so the exchange
    * moves ≤ files·2·cols tiny rows regardless of table size. */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Manifest-pruned box read: keep only the files whose [min, max] box
    * intersects every requested [lo, hi] range, then scan JUST those
    * files. The manifest is a bounded model-sized frame (one row per
    * file), so the file-list cut is a driver-side collect by design —
    * exactly what an Iceberg planner does with its manifest list. The
    * residual predicate is still applied (file granularity is coarser
    * than row granularity), and still pushes down into the pruned scan.
    * Returns (prunedFrame, filesSelected, filesTotal) so callers — and
    * the z3 gate — can assert the I/O bound, not just row equality. */
  def prunedRead(spark: SparkSession, path: String, manifest: DataFrame,
                 ranges: Map[String, (Long, Long)]): (DataFrame, Long, Long) = {
    val keep = ranges.foldLeft(lit(true)) { case (acc, (c, (lo, hi))) =>
      acc && col(s"max_$c") >= lo && col(s"min_$c") <= hi
    }
    val all = manifest.select("file").collect().map(_.getString(0))
    val selected = manifest.where(keep).select("file").collect()
      .map(_.getString(0))
    val residual = ranges.map { case (c, (lo, hi)) =>
      col(c).between(lo, hi)
    }.reduce(_ && _)
    val scan =
      if (selected.isEmpty)
        spark.read.parquet(path).where(residual).limit(0)
      else spark.read.parquet(selected: _*).where(residual)
    (scan, selected.length.toLong, all.length.toLong)
  }

  /** Small-file compaction — the maintenance rewrite every long-lived
    * table needs: streaming sinks and incremental batches leave
    * thousands of KB-sized files whose open/footer overhead dominates
    * scans and whose row groups are too small to skip. Size the output
    * from the INPUT's actual bytes (a driver-side file listing — the
    * same bounded metadata op any compactor performs): ceil(totalBytes /
    * targetBytes) files, rewritten with one round-robin repartition (no
    * sort — compaction restores file SIZE; clustering is zOrderWrite's
    * job and composes by running it instead). `maxFiles` caps the output
    * count regardless of bytes (the "compact to at most N" form).
    * Returns (filesIn, filesOut, totalBytes) so callers can gate the
    * I/O claim. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L << 20,
              maxFiles: Option[Int] = None): (Long, Long, Long) = {
    require(targetBytes >= (1L << 20),
      s"targetBytes >= 1 MiB, got $targetBytes")
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(inPath))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val bySize = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
    val nOut = maxFiles.fold(bySize)(m => math.min(bySize, m.toLong)).toInt
    spark.read.parquet(inPath)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outPath)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.length.toLong, outFiles.toLong, totalBytes)
  }
}
