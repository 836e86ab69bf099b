package graft.multimodal

import graft.functions.PolyHash
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling.
  *
  * Media travels as an opaque `binary` column plus typed metadata — the
  * schema, partitioning, and batch shapes are real and tested; only the
  * codec step is stubbed (see [[MediaDecoder]]) because no image/audio
  * libraries exist in this environment.
  *
  * Ingestion paths:
  *  - real files: `spark.read.format("binaryFile")` (path, length, content)
  *  - inline: any DataFrame with a binary column, via [[asMedia]]
  *
  * Scale notes: media rows are large and skew-prone — featurization uses
  * mapPartitions (one decoder instance per partition, streaming iterator,
  * no per-row setup), and downstream joins carry only (id, features),
  * never the bytes. Repartition by id range before decode when file sizes
  * are skewed.
  */
object Media {

  /** One media object: id + mime + raw bytes. */
  final case class MediaRecord(id: Long, mime: String, bytes: Array[Byte])

  /** Decoded per-object features. For images width/height are pixel dims;
    * for audio/video `frames` is the sampled frame/chunk count. */
  final case class MediaFeatures(id: Long, mime: String, byte_len: Long,
                                 content_hash: Long, width: Int, height: Int,
                                 frames: Int)

  /** Batched decoder contract: an iterator-to-iterator transform, one call
    * per partition (the JVM analog of a batched pandas UDF — amortizes
    * decoder setup and keeps memory bounded to a stream, not a partition).
    */
  trait MediaDecoder extends Serializable {
    def decode(batch: Iterator[MediaRecord]): Iterator[MediaFeatures]
  }

  /** STUB DECODER — deterministic fake in place of real codecs (???: no
    * image/audio libraries in this container). Derives plausible dims from
    * the content hash so the pipeline shape (schema, batching, joins,
    * partitioning) is fully exercised and reproducible; swap in a real
    * codec-backed MediaDecoder for production. */
  object StubDecoder extends MediaDecoder {
    override def decode(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      batch.map { r =>
        var h = 0L
        var i = 0
        while (i < r.bytes.length) { // same fold as PolyHash over raw bytes
          h = (h * 31 + (r.bytes(i) & 0xff)) % PolyHash.Prime
          i += 1
        }
        MediaFeatures(r.id, r.mime, r.bytes.length.toLong, h,
          width = (64 + h % 1856).toInt,
          height = (64 + (h / 7) % 1016).toInt,
          frames = (1 + h % 32).toInt)
      }
  }

  /** Normalize any (id, mime, binary) projection into the media schema. */
  def asMedia(df: DataFrame, id: Column, mime: Column, bytes: Column): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("id"), mime.cast("string").as("mime"),
      bytes.cast("binary").as("bytes")).as[MediaRecord]
  }

  /** Batched feature extraction: mapPartitions over the decoder. */
  def extractFeatures(media: Dataset[MediaRecord],
                      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(batch => decoder.decode(batch))
  }

  /** Frame sampling plumbing: one row per sampled frame index (stride
    * sampling over the decoded frame count). The real frame extraction
    * happens inside a codec-backed decoder; this operator owns the row
    * multiplication and keying shape. */
  def sampleFrames(features: Dataset[MediaFeatures], every: Int): DataFrame =
    features.toDF()
      .select(col("id"), col("frames"),
        explode(sequence(lit(0), col("frames") - 1, lit(every))).as("frame_idx"))

  /** Read real files as media (driver for production use; kept thin). */
  def readBinaryFiles(spark: SparkSession, path: String, mime: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(abs(xxhash64(col("path"))).as("id"), lit(mime).as("mime"),
        col("content").as("bytes")).as[MediaRecord]
  }
}
