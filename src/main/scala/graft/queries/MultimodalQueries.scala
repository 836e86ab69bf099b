package graft.queries

import graft.Tables
import graft.multimodal.Media
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column coverage: documents' text bytes stand in for media
  * payloads (ASCII ⇒ byte fold == char fold, so the DuckDB oracle can
  * replicate the stub decoder's hash-derived features exactly). The
  * pipeline exercised is the real one: binary column → batched
  * mapPartitions decode → features → frame-sample explode.
  */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String) =
    Media.asMedia(
      Tables.load(s, dir, "documents").where(col("doc_id") % 3 === 0),
      col("doc_id"), lit("text/plain"), encode(col("text"), "UTF-8"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M1: batched decode (stubbed codec) → typed feature frame.
    "m1_media_features" -> ((s, dir) =>
      Media.extractFeatures(media(s, dir)).toDF()
        .select(col("id"), col("mime"), col("byte_len"), col("content_hash"),
          col("width"), col("height"), col("frames"))),

    // M2: frame-sampling row multiplication (every 4th frame).
    "m2_frame_sample" -> ((s, dir) =>
      Media.sampleFrames(Media.extractFeatures(media(s, dir)), every = 4))
  )

  private val hashSql =
    """list_reduce(list_prepend(0::BIGINT,
      |  [ascii(c)::BIGINT for c in string_split(text, '')]),
      |  (h, c) -> (h * 31 + c) % 1000000007)""".stripMargin

  val oracles: Map[String, String] = Map(
    "m1_media_features" ->
      s"""WITH m AS (
         |  SELECT doc_id AS id, 'text/plain' AS mime,
         |         length(text)::BIGINT AS byte_len, $hashSql AS content_hash
         |  FROM documents WHERE doc_id % 3 = 0)
         |SELECT id, mime, byte_len, content_hash,
         |       (64 + content_hash % 1856)::INT AS width,
         |       (64 + (content_hash // 7) % 1016)::INT AS height,
         |       (1 + content_hash % 32)::INT AS frames
         |FROM m""".stripMargin,

    "m2_frame_sample" ->
      s"""WITH m AS (
         |  SELECT doc_id AS id,
         |         (1 + ($hashSql) % 32)::INT AS frames
         |  FROM documents WHERE doc_id % 3 = 0)
         |SELECT id, frames, unnest(generate_series(0, frames - 1, 4))::INT AS frame_idx
         |FROM m""".stripMargin
  )
}
