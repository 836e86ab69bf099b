package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k with BOUNDED aggregation state — the scale-correct form
  * of `row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k`.
  *
  * A window rank shuffles EVERY row to its group's partition and sorts
  * there: at 100 TB that is a full-data shuffle whose skewed groups sort
  * billions of rows to keep five. This aggregator holds at most k
  * (score, id) entries per group per task, partially aggregates map-side
  * (the shuffle moves ≤ k rows per group per partition), and merges
  * bounded buffers — the same mergeable-summary shape as the sketch
  * family ([[Sketches.HllAggregator]]), so it rides Spark's
  * ObjectHashAggregate with no sort anywhere.
  *
  * Ordering is total and integer-exact: higher score wins, equal scores
  * break toward the LOWER id — every engine replays it bit-for-bit
  * (scores are caller-quantized to integers, e.g. money in cents).
  * k is clamped small (≤ 4096) because the buffer is O(k) per group in
  * the hash map; a "top million" is a different query (sort it).
  */
object TopK {

  /** Parallel-array buffer; entries.length grows to at most k. */
  final case class Buf(scores: Array[Long], ids: Array[Long])

  final case class Entry(rank: Int, id: Long, score: Long)

  /** a=(sa,ida) beats b iff sa > sb, ties to the smaller id. */
  @inline private def beats(sa: Long, ida: Long, sb: Long, idb: Long): Boolean =
    sa > sb || (sa == sb && ida < idb)

  class TopKAggregator(k: Int)
      extends Aggregator[(Long, Long), Buf, Seq[Entry]] {
    require(k >= 1 && k <= 4096, s"k in [1, 4096], got $k")

    override def zero: Buf = Buf(Array.emptyLongArray, Array.emptyLongArray)

    private def insert(b: Buf, s: Long, id: Long): Buf = {
      val n = b.scores.length
      if (n < k) {
        Buf(b.scores :+ s, b.ids :+ id)
      } else {
        // find the current worst (lowest score, ties to the HIGHER id —
        // the exact complement of `beats`, so the kept set is unique)
        var worst = 0
        var i = 1
        while (i < n) {
          if (beats(b.scores(worst), b.ids(worst), b.scores(i), b.ids(i)))
            worst = i
          i += 1
        }
        if (beats(s, id, b.scores(worst), b.ids(worst))) {
          b.scores(worst) = s
          b.ids(worst) = id
        }
        b
      }
    }

    override def reduce(b: Buf, in: (Long, Long)): Buf =
      insert(b, in._1, in._2)

    override def merge(a: Buf, b: Buf): Buf = {
      var acc = a
      var i = 0
      while (i < b.scores.length) {
        acc = insert(acc, b.scores(i), b.ids(i))
        i += 1
      }
      acc
    }

    override def finish(b: Buf): Seq[Entry] = {
      val order = b.scores.indices.sortWith { (i, j) =>
        beats(b.scores(i), b.ids(i), b.scores(j), b.ids(j))
      }
      order.zipWithIndex.map { case (i, r) =>
        Entry(r + 1, b.ids(i), b.scores(i))
      }
    }

    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      ExpressionEncoder[Seq[Entry]]()
  }

  /** Top-k rows per group: one aggregation pass, ≤ k entries of state per
    * group per task, exploded back to (groupCols..., rank, id, score)
    * rows. `score` must be an integer column (quantize money/doubles to
    * micro/cent units upstream — the tie rule is exact, not float). */
  def groupedTopK(df: DataFrame, groupCols: Seq[Column], score: Column,
                  id: Column, k: Int): DataFrame = {
    val agg = udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    df.groupBy(groupCols: _*)
      .agg(agg(score.cast("long"), id.cast("long")).as("topk"))
      .select(groupCols :+ explode(col("topk")).as("e"): _*)
      .select(groupCols ++ Seq(col("e.rank").as("rank"), col("e.id").as("id"),
        col("e.score").as("score")): _*)
  }
}
