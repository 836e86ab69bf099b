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

  /** Decoded per-object features. For images width/height are pixel dims
    * and frames is 1; for audio width is the sample rate, height the
    * channel count, and frames the sample-frame count; all three are -1
    * when the payload's format isn't recognized. */
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

  /** Same fold as PolyHash, over raw bytes. */
  private def byteFold(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % PolyHash.Prime
      i += 1
    }
    h
  }

  /** STUB DECODER — deterministic fake in place of real codecs. Derives
    * plausible dims from the content hash so pipeline shapes stay
    * exercised for payloads with no parseable header (e.g. raw text
    * fixtures); [[HeaderDecoder]] is the default. */
  object StubDecoder extends MediaDecoder {
    override def decode(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      batch.map { r =>
        val h = byteFold(r.bytes)
        MediaFeatures(r.id, r.mime, r.bytes.length.toLong, h,
          width = (64 + h % 1856).toInt,
          height = (64 + (h / 7) % 1016).toInt,
          frames = (1 + h % 32).toInt)
      }
  }

  /** HEADER DECODER (default) — real pure-JVM parsing of public container
    * formats, no codec libraries: PNG width/height from the IHDR chunk
    * (PNG spec: 8-byte signature, then length+"IHDR"+13-byte data, dims
    * big-endian at offsets 16/20) and WAV sample-rate/channels/sample-frame
    * count from the RIFF fmt/data chunks (little-endian). Formats are
    * detected by MAGIC BYTES, not the mime column — mislabeled rows parse
    * by content. Unrecognized payloads yield (-1, -1, -1) dims rather than
    * fake numbers; full pixel/sample decode stays out of scope (that part
    * needs real codec libraries). */
  object HeaderDecoder extends MediaDecoder {
    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private val PngSig =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def isPng(b: Array[Byte]): Boolean =
      b.length >= 24 && PngSig.indices.forall(i => b(i) == PngSig(i)) &&
        tag(b, 12) == "IHDR"

    private def isWav(b: Array[Byte]): Boolean =
      b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE"

    /** (sampleRate, channels, sampleFrames) from the fmt/data chunks, or
      * None when either chunk is missing/truncated. */
    private def wavInfo(b: Array[Byte]): Option[(Int, Int, Int)] = {
      // long offsets + a negative-size bail-out: the chunk size is an
      // UNTRUSTED signed 32-bit field — a negative or huge value must
      // degrade to "not parseable", never spin the walk loop or wrap the
      // offset into an out-of-bounds read
      var o = 12L
      var fmt: Option[(Int, Int, Int)] = None // rate, channels, blockAlign
      var dataLen: Option[Int] = None
      var bad = false
      while (!bad && o + 8 <= b.length && (fmt.isEmpty || dataLen.isEmpty)) {
        val oi = o.toInt
        val id = tag(b, oi)
        val size = le32(b, oi + 4)
        if (size < 0) bad = true
        else {
          if (id == "fmt " && size >= 16 && o + 8 + 16 <= b.length)
            fmt = Some((le32(b, oi + 12), le16(b, oi + 10), le16(b, oi + 20)))
          else if (id == "data")
            // clamp to the bytes actually present: a truncated file with an
            // intact header must not report phantom frames (sampleFrames
            // would multiply them into phantom rows)
            dataLen = Some(math.min(size.toLong, math.max(0L, b.length - (o + 8))).toInt)
          // chunks are word-aligned: odd sizes carry a pad byte
          o += 8L + size.toLong + (size & 1)
        }
      }
      for ((rate, ch, block) <- fmt if ch > 0 && block > 0; d <- dataLen)
        yield (rate, ch, d / block)
    }

    override def decode(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      batch.map { r =>
        val b = r.bytes
        val h = byteFold(b)
        val (w, ht, fr) =
          if (isPng(b)) (be32(b, 16), be32(b, 20), 1)
          else if (isWav(b)) wavInfo(b).getOrElse((-1, -1, -1))
          else (-1, -1, -1)
        MediaFeatures(r.id, r.mime, b.length.toLong, h, w, ht, fr)
      }
  }

  // ---- minimal valid sample builders (fixtures + round-trip tests) ------

  /** A minimal, spec-valid PNG: signature + IHDR (8-bit RGB, real CRC32s)
    * + IEND; 45 bytes total. No IDAT — header-parse fixtures only. */
  def pngBytes(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(45)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(17) // type + 13 data bytes
    ihdr.put("IHDR".getBytes("US-ASCII"))
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val crc = new java.util.zip.CRC32
    crc.update(ihdr.array())
    out.putInt(13).put(ihdr.array()).putInt(crc.getValue.toInt)
    val iendCrc = new java.util.zip.CRC32
    iendCrc.update("IEND".getBytes("US-ASCII"))
    out.putInt(0).put("IEND".getBytes("US-ASCII")).putInt(iendCrc.getValue.toInt)
    out.array()
  }

  /** A minimal, spec-valid 16-bit PCM WAV with `frames` zeroed sample
    * frames; 44 + frames·channels·2 bytes total. */
  def wavBytes(sampleRate: Int, channels: Int, frames: Int): Array[Byte] = {
    val dataLen = frames * channels * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1.toShort).putShort(channels.toShort)
    out.putInt(sampleRate).putInt(sampleRate * channels * 2)
    out.putShort((channels * 2).toShort).putShort(16.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    out.array() // data region stays zeroed
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
                      decoder: MediaDecoder = HeaderDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(batch => decoder.decode(batch))
  }

  /** Frame sampling plumbing: one row per sampled frame index (stride
    * sampling over the decoded frame count). The real frame extraction
    * happens inside a codec-backed decoder; this operator owns the row
    * multiplication and keying shape. Rows with no positive frame count —
    * [[HeaderDecoder]]'s -1 for unrecognized payloads — contribute no
    * frames (an unguarded sequence(0, -2) would throw at runtime). */
  def sampleFrames(features: Dataset[MediaFeatures], every: Int): DataFrame =
    features.toDF()
      .where(col("frames") > 0)
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
