package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
