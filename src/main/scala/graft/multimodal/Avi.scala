package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

/** Pure-JVM RIFF/AVI container codec — the video leg of the multimodal
  * column surface (PNG/BMP/JPEG images in [[Media]]/[[Jpeg]], PCM WAV
  * audio in [[Media]], AVI video here).
  *
  * Scope mirrors the repo's media policy: the CONTAINER plus the two
  * frame codecs exactly decodable in pure JVM — 'DIB ' (each '00db'
  * chunk is a BMP pixel array: bottom-up BGR rows, 4-byte stride) and
  * 'MJPG' Motion JPEG (each '00dc' chunk is a complete JPEG image run
  * through the [[Jpeg]] codec). Other fourccs (H.264, …) yield None
  * from the sample-level paths — loud drop, never a fake decode — while
  * [[dimensions]] still reports container geometry for any spec-valid
  * AVI. Frame SAMPLING (every k-th frame of a clip, the standard
  * video-to-training-examples step) is a row-multiplication operator
  * over the decoded frame list, map-only like every media pass.
  *
  * Layout written (and the only one required when reading — readers
  * walk chunks, so extra chunks like 'idx1' or 'JUNK' are skipped):
  * RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
  * '00db'×n)).
  */
object Avi {

  // ---- byte plumbing ------------------------------------------------------

  private def w32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }
  private def w16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }
  private def wTag(out: java.io.ByteArrayOutputStream, t: String): Unit =
    out.write(t.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && Media.Bytes.tag(b, 0) == "RIFF" &&
      Media.Bytes.tag(b, 8) == "AVI "

  private def stride(w: Int): Int = (w * 3 + 3) & ~3

  // ---- encode -------------------------------------------------------------

  /** Build a spec-valid AVI from raster-order (top-down) BGR frames,
    * each exactly height·width·3 bytes. Rows are written bottom-up with
    * 4-byte stride padding — the DIB storage form. */
  def encode(width: Int, height: Int, frames: Seq[Array[Byte]],
             fps: Int = 25): Array[Byte] = {
    require(width > 0 && height > 0, s"dims must be positive: $width x $height")
    require(fps > 0, s"fps must be positive, got $fps")
    frames.foreach(f => require(f.length == width * height * 3,
      s"frame must be ${width * height * 3} bytes, got ${f.length}"))
    val st = stride(width)
    val frameBytes = st * height

    def dib(frame: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](frameBytes)
      var y = 0
      while (y < height) {
        // raster row y lands at bottom-up row (height-1-y)
        System.arraycopy(frame, y * width * 3, out, (height - 1 - y) * st,
          width * 3)
        y += 1
      }
      out
    }
    encodeContainer(width, height, frames.map(dib), fps,
      handler = "DIB ", compression = 0, chunkTag = "00db", frameBytes)
  }

  /** Build a Motion-JPEG AVI: raster-order (top-down) BGR frames, each
    * height·width·3 bytes, individually compressed with the pure-JVM
    * [[Jpeg]] encoder into '00dc' chunks (fccHandler 'MJPG',
    * biCompression 'MJPG'). `quality` < 100 uses the Annex K tables at
    * that IJG quality; 100 keeps unit quantization (bit-exact for
    * block-constant gray-valued frames — the oracle-checkable family). */
  def encodeMjpg(width: Int, height: Int, frames: Seq[Array[Byte]],
                 fps: Int = 25, quality: Int = 100): Array[Byte] = {
    require(width > 0 && height > 0, s"dims must be positive: $width x $height")
    require(fps > 0, s"fps must be positive, got $fps")
    frames.foreach(f => require(f.length == width * height * 3,
      s"frame must be ${width * height * 3} bytes, got ${f.length}"))
    val (lq, cq) =
      if (quality >= 100) (Jpeg.UnitQuant, Jpeg.UnitQuant)
      else (Jpeg.scaledQuant(Jpeg.StdLumaQuant, quality),
        Jpeg.scaledQuant(Jpeg.StdChromaQuant, quality))
    val payloads = frames.map { bgr =>
      val rgb = bgr.clone()
      var i = 0
      while (i < rgb.length) { // frame contract is BGR; JPEG wants RGB
        val b0 = rgb(i); rgb(i) = rgb(i + 2); rgb(i + 2) = b0
        i += 3
      }
      Jpeg.encodeRgb(width, height, rgb, lq, cq)
    }
    // 'MJPG' fourcc little-endian in biCompression
    val mjpg = ('M' << 0) | ('J' << 8) | ('P' << 16) | ('G' << 24)
    encodeContainer(width, height, payloads, fps,
      handler = "MJPG", compression = mjpg, chunkTag = "00dc",
      suggestedBuf = payloads.map(_.length).max)
  }

  private def encodeContainer(width: Int, height: Int,
                              payloads: Seq[Array[Byte]], fps: Int,
                              handler: String, compression: Int,
                              chunkTag: String,
                              suggestedBuf: Int): Array[Byte] = {
    val frameBytes = suggestedBuf
    val out = new java.io.ByteArrayOutputStream()
    // ---- hdrl
    val hdrl = new java.io.ByteArrayOutputStream()
    wTag(hdrl, "hdrl")
    wTag(hdrl, "avih"); w32(hdrl, 56)
    w32(hdrl, 1000000 / fps); w32(hdrl, frameBytes * fps); w32(hdrl, 0)
    w32(hdrl, 0); w32(hdrl, payloads.size); w32(hdrl, 0); w32(hdrl, 1)
    w32(hdrl, frameBytes); w32(hdrl, width); w32(hdrl, height)
    (0 until 4).foreach(_ => w32(hdrl, 0))
    // strl list
    val strl = new java.io.ByteArrayOutputStream()
    wTag(strl, "strl")
    wTag(strl, "strh"); w32(strl, 56)
    wTag(strl, "vids"); wTag(strl, handler)
    w32(strl, 0); w16(strl, 0); w16(strl, 0); w32(strl, 0)
    w32(strl, 1); w32(strl, fps) // scale/rate
    w32(strl, 0); w32(strl, payloads.size); w32(strl, frameBytes)
    w32(strl, -1); w32(strl, 0)
    w16(strl, 0); w16(strl, 0); w16(strl, width); w16(strl, height)
    wTag(strl, "strf"); w32(strl, 40)
    w32(strl, 40); w32(strl, width); w32(strl, height); w16(strl, 1)
    w16(strl, 24); w32(strl, compression); w32(strl, frameBytes)
    w32(strl, 0); w32(strl, 0); w32(strl, 0); w32(strl, 0)
    wTag(hdrl, "LIST"); w32(hdrl, strl.size()); hdrl.write(strl.toByteArray)
    // ---- movi
    val movi = new java.io.ByteArrayOutputStream()
    wTag(movi, "movi")
    payloads.foreach { p =>
      wTag(movi, chunkTag); w32(movi, p.length); movi.write(p)
      if ((p.length & 1) == 1) movi.write(0) // word alignment pad
    }
    // ---- riff shell
    val body = new java.io.ByteArrayOutputStream()
    wTag(body, "AVI ")
    wTag(body, "LIST"); w32(body, hdrl.size()); body.write(hdrl.toByteArray)
    wTag(body, "LIST"); w32(body, movi.size()); body.write(movi.toByteArray)
    wTag(out, "RIFF"); w32(out, body.size()); out.write(body.toByteArray)
    out.toByteArray
  }

  // ---- decode -------------------------------------------------------------

  /** Container geometry (width, height, totalFrames) from the 'avih'
    * header — None unless the bytes walk as a spec-valid AVI. */
  def dimensions(b: Array[Byte]): Option[(Int, Int, Int)] =
    walk(b).map { case (w, h, n, _, _) => (w, h, n) }

  /** All frames decoded to raster-order (top-down) BGR bytes, each
    * height·width·3 — None when the container is malformed, a frame
    * chunk is truncated, or the frame count disagrees with the header
    * (a silent partial clip would poison frame sampling). */
  def framePixels(b: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] =
    walk(b).flatMap { case (w, h, n, handler, chunks) =>
      if (chunks.size != n) None
      else handler match {
        // uncompressed DIB: bottom-up stride-padded BGR rows
        case Some("DIB ") =>
          val st = stride(w)
          if (chunks.exists(_.length < st * h)) None
          else Some((w, h, chunks.map { dibData =>
            val out = new Array[Byte](w * h * 3)
            var y = 0
            while (y < h) {
              System.arraycopy(dibData, (h - 1 - y) * st, out, y * w * 3, w * 3)
              y += 1
            }
            out
          }))
        // Motion JPEG: each '00dc' chunk is a complete JPEG image the
        // pure-JVM [[Jpeg]] codec decodes; every frame must decode to
        // the container's exact 3-channel geometry (a silent partial or
        // mis-sized clip would poison frame sampling). Decoded RGB is
        // swapped to BGR so all handlers share one frame contract.
        case Some("MJPG") =>
          val out = Seq.newBuilder[Array[Byte]]
          var ok = true
          chunks.foreach { jpg =>
            if (ok) Jpeg.decodePixels(jpg) match {
              case Some((fw, fh, 3, pix)) if fw == w && fh == h =>
                var i = 0
                while (i < pix.length) { // RGB → BGR in place
                  val r = pix(i); pix(i) = pix(i + 2); pix(i + 2) = r
                  i += 3
                }
                out += pix
              case _ => ok = false
            }
          }
          if (ok) Some((w, h, out.result())) else None
        // anything else (H.264, …) stays loudly undecodable
        case _ => None
      }
    }

  /** Chunk walk: (width, height, totalFrames, video-stream strh
    * fccHandler, '00db'/'00dc' payloads). Bounds are checked at every
    * step — truncation returns None, never a partial parse. */
  private def walk(
      b: Array[Byte]): Option[(Int, Int, Int, Option[String], Seq[Array[Byte]])] = {
    import Media.Bytes.{le32, tag}
    if (!isAvi(b)) return None
    var dims: Option[(Int, Int, Int)] = None
    var handler: Option[String] = None
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()

    def chunks(from: Int, until: Int): Boolean = {
      var o = from
      while (o + 8 <= until) {
        val t = tag(b, o)
        val size = le32(b, o + 4)
        if (size < 0 || o + 8 + size > until) return false
        t match {
          case "LIST" =>
            if (size < 4) return false
            // recurse past the 4-byte list type ('hdrl'/'strl'/'movi'/…)
            if (!chunks(o + 12, o + 8 + size)) return false
          case "avih" =>
            if (size < 40) return false
            dims = Some((le32(b, o + 8 + 32), le32(b, o + 8 + 36),
              le32(b, o + 8 + 16)))
          case "strh" =>
            // fccType at +0, fccHandler at +4; only the video stream's
            // handler gates frame decode (audio 'auds' streams don't)
            if (size >= 8 && tag(b, o + 8) == "vids")
              handler = Some(tag(b, o + 12))
          case "00db" | "00dc" =>
            frames += java.util.Arrays.copyOfRange(b, o + 8, o + 8 + size)
          case _ => // strf/JUNK/idx1/…: skip
        }
        o += 8 + size + (size & 1) // chunks are word-aligned
      }
      true
    }
    if (!chunks(12, b.length)) return None
    dims.collect { case (w, h, n) if w > 0 && h > 0 && n >= 0 =>
      (w, h, n, handler, frames.toSeq)
    }
  }

  // ---- operators ----------------------------------------------------------

  /** Per-sampled-frame sample statistics: every `every`-th frame of each
    * clip decoded and aggregated to (id, frame_idx, n_samples, mean_val,
    * min_val, max_val) — the video twin of [[Media.extractStats]]
    * composed with [[Media.sampleFrames]]'s stride rule. mapPartitions,
    * map-only, scan-bound; undecodable payloads contribute no row. The
    * integer sample sum is exact, so the mean is one deterministic IEEE
    * division an oracle reproduces bit-for-bit. */
  def frameStats(media: Dataset[Media.MediaRecord], every: Int): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { rec =>
      framePixels(rec.bytes).toSeq.flatMap { case (w, h, frames) =>
        (0 until frames.size by every).map { fi =>
          val pix = frames(fi)
          var sum = 0L
          var mn = 255L
          var mx = 0L
          var i = 0
          while (i < pix.length) {
            val v = pix(i) & 0xff
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          (rec.id, fi, pix.length.toLong, sum.toDouble / pix.length, mn, mx)
        }
      }
    }).toDF("id", "frame_idx", "n_samples", "mean_val", "min_val", "max_val")
  }
}
