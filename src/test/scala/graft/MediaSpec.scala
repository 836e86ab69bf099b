package graft

import graft.functions.PolyHash
import graft.multimodal.Media
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary columns, batched stub decode, frame
  * sampling. The stub decoder's hash must equal the char-level PolyHash
  * for ASCII payloads (byte fold == char fold). */
class MediaSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "spark native engine"), (3L, ""))
    .toDF("doc_id", "text")

  // NB: qualified functions.length — ScalaTest Matchers shadows `length`.
  private def media = Media.asMedia(
    docs.where(org.apache.spark.sql.functions.length(col("text")) > 0),
    col("doc_id"), lit("text/plain"), encode(col("text"), "UTF-8"))

  "extractFeatures" should "produce hash-consistent features per record" in {
    val got = Media.extractFeatures(media).collect().map(f => f.id -> f).toMap
    got(1L).byte_len shouldBe 11L
    got(1L).content_hash shouldBe PolyHash.hash("hello world", 31L)
    got(2L).content_hash shouldBe PolyHash.hash("spark native engine", 31L)
    got.values.foreach { f =>
      f.width should (be >= 64 and be < 1920)
      f.height should (be >= 64 and be < 1080)
      f.frames should (be >= 1 and be <= 32)
    }
  }

  "sampleFrames" should "emit stride-sampled frame indexes" in {
    val feats = Media.extractFeatures(media)
    val got = Media.sampleFrames(feats, every = 4)
      .groupBy("id").agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
      .as[(Long, Long, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val frames = feats.collect().map(f => f.id -> f.frames).toMap
    frames.foreach { case (id, n) =>
      got(id)._1 shouldBe ((n + 3) / 4).toLong // ceil(frames/4) samples
      got(id)._2 should be < n
    }
  }
}
