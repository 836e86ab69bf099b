package graft.queries

import graft.Tables
import graft.multimodal.Media
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column coverage over SYNTHETIC REAL media: every third
  * document becomes a spec-valid PNG (even doc_id) or 16-bit PCM WAV (odd
  * doc_id) whose header fields derive from table columns, so the DuckDB
  * oracle predicts the TRUE decoded values — the byte build → header parse
  * round-trip must reproduce them exactly for the hash to match. The
  * pipeline exercised is the real one: binary column → batched
  * mapPartitions decode ([[Media.HeaderDecoder]], pure-JVM PNG IHDR / WAV
  * fmt+data parsing) → features → frame-sample explode.
  */
object MultimodalQueries {

  import Media.MediaRecord

  /** PNG dims / WAV params as pure functions of (doc_id, n_chars) — the
    * oracle computes these same formulas directly. */
  private def media(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.load(s, dir, "documents").where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, n) =>
        if (id % 2 == 0)
          MediaRecord(id, "image/png",
            Media.pngBytes((16 + n % 496).toInt, (1 + id % 256).toInt))
        else
          MediaRecord(id, "audio/wav",
            Media.wavBytes((8000 * (1 + id % 3)).toInt, (1 + id % 2).toInt,
              (10 + id % 90).toInt))
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M1: batched header decode → typed feature frame with TRUE dims.
    "m1_media_features" -> ((s, dir) =>
      Media.extractFeatures(media(s, dir)).toDF()
        .select(col("id"), col("mime"), col("byte_len"),
          col("width"), col("height"), col("frames"))),

    // M2: frame-sampling row multiplication (every 4th sample frame; PNGs
    // contribute their single frame).
    "m2_frame_sample" -> ((s, dir) =>
      Media.sampleFrames(Media.extractFeatures(media(s, dir)), every = 4))
  )

  // Shared truth formulas (see `media` above):
  //   PNG: width 16+n%496, height 1+id%256, frames 1, bytes 45 (fixed)
  //   WAV: rate 8000*(1+id%3), channels 1+id%2, frames 10+id%90,
  //        bytes 44 + frames*channels*2
  private val featureSql =
    """SELECT doc_id AS id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
      |  CASE WHEN doc_id % 2 = 0 THEN 45
      |       ELSE 44 + (10 + doc_id % 90) * (1 + doc_id % 2) * 2
      |       END::BIGINT AS byte_len,
      |  CASE WHEN doc_id % 2 = 0 THEN 16 + n_chars % 496
      |       ELSE 8000 * (1 + doc_id % 3) END::INT AS width,
      |  CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 256
      |       ELSE 1 + doc_id % 2 END::INT AS height,
      |  CASE WHEN doc_id % 2 = 0 THEN 1
      |       ELSE 10 + doc_id % 90 END::INT AS frames
      |FROM documents WHERE doc_id % 3 = 0""".stripMargin

  val oracles: Map[String, String] = Map(
    "m1_media_features" ->
      s"""SELECT id, mime, byte_len, width, height, frames
         |FROM ($featureSql)""".stripMargin,

    "m2_frame_sample" ->
      s"""SELECT id, frames,
         |       unnest(generate_series(0, frames - 1, 4))::INT AS frame_idx
         |FROM ($featureSql)""".stripMargin
  )
}
