package graft.multimodal

import scala.collection.mutable

/** Pure-JVM GIF codec (CompuServe GIF89a, public spec): logical-screen /
  * image-descriptor parsing, global and local color tables, extension-block
  * skipping, and the full variable-width LZW scheme — clear/EOI codes,
  * 9→12-bit width growth, the KwKwK (code == next-slot) case, and the
  * 4096-entry dictionary reset. The encoder is a REAL LZW compressor
  * (prefix-dictionary, not the literal-codes "uncompressed GIF" trick), so
  * round-trip tests drive every decoder path with genuinely compressed
  * streams.
  *
  * Interlaced images (GIF spec appendix E four-pass row order) decode
  * through a stored-row → raster-row remap after LZW; the encoder's
  * `interlaced` mode writes the same schedule so round trips cover it.
  *
  * Reference behavior context: the reference engine (oni-ml) has no
  * multimodal path at all; this extends the engine for binary-column
  * corpora per the builder brief, following the Media.scala fixture
  * pattern (closed-form synthetic media the DuckDB oracle can predict).
  */
object Gif {

  def isGif(b: Array[Byte]): Boolean =
    b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** (width, height) from the logical screen descriptor. */
  def dimensions(b: Array[Byte]): Option[(Int, Int)] =
    if (!isGif(b)) None
    else {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w <= 0 || h <= 0) None else Some((w, h))
    }

  // ---- encoder -----------------------------------------------------------

  /** A spec-valid single-frame GIF89a. `palette` holds packed 0xRRGGBB
    * entries (2..256 of them — padded up to the next power of two in the
    * file); every index must be < palette.length. */
  def encode(width: Int, height: Int, palette: Array[Int],
             indices: Array[Byte]): Array[Byte] =
    encodeFrames(width, height, palette, Seq(indices))

  /** GIF interlace row schedule (spec appendix E): the raster rows in
    * the order their scanlines are stored — pass 1 every 8th from 0,
    * pass 2 every 8th from 4, pass 3 every 4th from 2, pass 4 odd rows. */
  private def interlaceOrder(height: Int): Array[Int] = {
    val order = new Array[Int](height)
    var k = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var r = start
      while (r < height) { order(k) = r; k += 1; r += step }
    }
    order
  }

  /** A spec-valid ANIMATED GIF89a: one image block per frame, every
    * frame full-screen at (0,0) sharing the global color table (the
    * replace-disposal subset — exactly what [[decodeFrames]] accepts).
    * `interlaced` stores each frame's rows in the 4-pass interlace
    * schedule and sets the descriptor flag. */
  def encodeFrames(width: Int, height: Int, palette: Array[Int],
                   frames: Seq[Array[Byte]],
                   interlaced: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    frames.foreach(f => require(width > 0 && height > 0 &&
      width * height == f.length,
      s"geometry $width x $height != ${f.length} indices"))
    require(palette.length >= 2 && palette.length <= 256,
      s"palette size ${palette.length} outside 2..256")
    // GCT size field stores bits-1 where the table has 2^bits entries
    var bits = 1
    while ((1 << bits) < palette.length) bits += 1
    val out = new java.io.ByteArrayOutputStream(1024)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(width); w16(height)
    w8(0x80 | ((bits - 1) << 4) | (bits - 1)) // GCT present, size = 2^bits
    w8(0); w8(0)                              // bg index, aspect
    var i = 0
    while (i < (1 << bits)) {
      val rgb = if (i < palette.length) palette(i) else 0
      w8(rgb >> 16); w8(rgb >> 8); w8(rgb)
      i += 1
    }
    val minCode = math.max(2, bits)
    frames.foreach { indices =>
      w8(0x2c); w16(0); w16(0); w16(width); w16(height)
      w8(if (interlaced) 0x40 else 0) // image descriptor flags
      w8(minCode)
      val stored =
        if (!interlaced) indices
        else {
          val s = new Array[Byte](indices.length)
          val order = interlaceOrder(height)
          var k = 0
          while (k < height) {
            System.arraycopy(indices, order(k) * width, s, k * width, width)
            k += 1
          }
          s
        }
      out.write(lzwCompress(stored, minCode))
      w8(0) // block terminator
    }
    w8(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-variant LZW: variable 3..12-bit codes LSB-first, clear emitted
    * up front and again on dictionary overflow, EOI last, packed into
    * <=255-byte sub-blocks. Width grows when the next emittable code
    * value (next-1) would no longer fit — the exact mirror of the
    * decoder's post-add `next == 1 << codeSize` bump, which keeps both
    * sides' widths aligned code-for-code. */
  private def lzwCompress(data: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode; val eoi = clear + 1
    val blocks = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val cur = new Array[Byte](255)
    var curLen = 0
    var bitBuf = 0L; var bitCnt = 0
    var codeSize = minCode + 1
    def flushByte(): Unit = {
      cur(curLen) = (bitBuf & 0xff).toByte; curLen += 1
      bitBuf >>>= 8; bitCnt -= 8
      if (curLen == 255) { blocks.write(curLen); blocks.write(cur, 0, curLen); curLen = 0 }
    }
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += codeSize
      while (bitCnt >= 8) flushByte()
    }
    val dict = new mutable.HashMap[Int, Int] // (prefix << 8 | byte) -> code
    var next = eoi + 1
    def reset(): Unit = { dict.clear(); next = eoi + 1; codeSize = minCode + 1 }
    emit(clear)
    if (data.nonEmpty) {
      var prefix = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = (prefix << 8) | k
        dict.get(key) match {
          case Some(c) => prefix = c
          case None =>
            emit(prefix)
            if (next <= 4095) {
              dict(key) = next; next += 1
              // after the add, next-1 is the largest emittable value; the
              // decoder may also receive next-1 AS its KwKwK next-slot, so
              // both sides widen on the same boundary
              if (next - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
            } else { emit(clear); reset() } // dictionary full: start over
            prefix = k
        }
        i += 1
      }
      emit(prefix)
    }
    emit(eoi)
    while (bitCnt > 0) flushByte()
    if (curLen > 0) { blocks.write(curLen); blocks.write(cur, 0, curLen) }
    blocks.toByteArray
  }

  // ---- decoder -----------------------------------------------------------

  /** Full decode of the first frame: (width, height, packed RGB raster,
    * height*width*3 bytes). See [[decodeFrames]] for the accepted
    * subset and refusal rules. */
  def decodePixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeFrames(b).map { case (w, h, fs) => (w, h, fs.head) }

  /** EVERY frame of a (possibly animated) GIF as palette-mapped RGB
    * rasters. Accepted subset: all frames full-screen at (0, 0) — the
    * replace-disposal form [[encodeFrames]] writes; partial frames would
    * need disposal-method compositing (a silently-wrong decode, so they
    * refuse instead). Extensions (0x21) are skipped; a local color table
    * overrides the global one per frame; interlaced frames deinterlace
    * through the 4-pass row remap; any truncated or out-of-spec stream
    * (including a missing trailer) yields
    * None — loud, never a fake. The LZW dictionary resets per frame
    * (each image block carries its own code stream, per spec). */
  def decodeFrames(b: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
    if (!isGif(b)) return None
    val sw = le16(b, 6); val sh = le16(b, 8)
    if (sw <= 0 || sh <= 0) return None
    if (sw.toLong * sh * 3 > Int.MaxValue - 8) return None
    val packed = b(10) & 0xff
    var pos = 13
    var palette: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 0x07) + 1)
      if (pos + 3 * n > b.length) return None
      palette = readPalette(b, pos, n); pos += 3 * n
    }
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    while (pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x21 => // extension: label byte, then sub-blocks to a 0 byte
          pos += 2
          var ok = pos < b.length
          while (ok && (b(pos) & 0xff) != 0) {
            pos += 1 + (b(pos) & 0xff)
            ok = pos < b.length
          }
          if (!ok) return None
          pos += 1
        case 0x2c =>
          if (pos + 10 > b.length) return None
          val left = le16(b, pos + 1); val top = le16(b, pos + 3)
          val w = le16(b, pos + 5); val h = le16(b, pos + 7)
          val ip = b(pos + 9) & 0xff
          pos += 10
          if (left != 0 || top != 0 || w != sw || h != sh) return None
          val interlaced = (ip & 0x40) != 0
          var pal = palette
          if ((ip & 0x80) != 0) {
            val n = 1 << ((ip & 0x07) + 1)
            if (pos + 3 * n > b.length) return None
            pal = readPalette(b, pos, n); pos += 3 * n
          }
          if (pal == null) return None
          if (pos >= b.length) return None
          val minCode = b(pos) & 0xff; pos += 1
          if (minCode < 2 || minCode > 11) return None
          lzwDecompress(b, pos, minCode, w * h) match {
            case None => return None
            case Some((idx0, end)) =>
              // interlaced frames store scanlines in the 4-pass schedule;
              // map stored row k back to raster row order(k)
              val idx =
                if (!interlaced) idx0
                else {
                  val d = new Array[Byte](idx0.length)
                  val order = interlaceOrder(h)
                  var k = 0
                  while (k < h) {
                    System.arraycopy(idx0, k * w, d, order(k) * w, w)
                    k += 1
                  }
                  d
                }
              val out = new Array[Byte](w * h * 3)
              var i = 0
              while (i < idx.length) {
                val e = idx(i) & 0xff
                if (e >= pal.length) return None
                val rgb = pal(e)
                out(i * 3) = (rgb >> 16).toByte
                out(i * 3 + 1) = (rgb >> 8).toByte
                out(i * 3 + 2) = rgb.toByte
                i += 1
              }
              frames += out
              pos = end
          }
        case 0x3b => // trailer
          return if (frames.nonEmpty) Some((sw, sh, frames.toSeq)) else None
        case _ => return None // out-of-spec block
      }
    }
    None // ran off the end without a trailer
  }

  /** Per-sampled-frame RGB channel statistics over animated GIFs — the
    * [[Avi.frameStats]] shape for the GIF container: every `every`-th
    * frame of each clip contributes (id, frame_idx, n_samples, mean,
    * min, max) over its palette-mapped channel bytes. Batched
    * mapPartitions decode; undecodable payloads contribute nothing. */
  def frameStats(media: org.apache.spark.sql.Dataset[Media.MediaRecord],
                 every: Int): org.apache.spark.sql.DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { rec =>
      decodeFrames(rec.bytes).toSeq.flatMap { case (_, _, frames) =>
        (0 until frames.size by every).map { fi =>
          val pix = frames(fi)
          var sum = 0L; var mn = 255L; var mx = 0L
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

  private def readPalette(b: Array[Byte], off: Int, n: Int): Array[Int] =
    Array.tabulate(n) { i =>
      ((b(off + 3 * i) & 0xff) << 16) | ((b(off + 3 * i + 1) & 0xff) << 8) |
        (b(off + 3 * i + 2) & 0xff)
    }

  /** GIF LZW decode of exactly `expected` pixels from the sub-block
    * stream at `pos`. The dictionary stores (prefixCode, tailByte) pairs
    * and strings materialize by walking prefix chains — O(output), no
    * per-entry string copies. None on truncation, a code beyond the next
    * free slot, or a pixel count mismatch. Returns the pixels plus the
    * offset just past the stream's 0-terminator, so a multi-frame walk
    * can continue at the next block. */
  private def lzwDecompress(b: Array[Byte], pos0: Int, minCode: Int,
                            expected: Int): Option[(Array[Byte], Int)] = {
    val clear = 1 << minCode; val eoi = clear + 1
    val prefix = new Array[Int](4096); val tail = new Array[Byte](4096)
    val length = new Array[Int](4096)
    var i = 0
    while (i < clear) { prefix(i) = -1; tail(i) = i.toByte; length(i) = 1; i += 1 }
    var next = eoi + 1; var codeSize = minCode + 1
    val out = new Array[Byte](expected)
    var outLen = 0
    var prev = -1
    var pos = pos0
    var blockEnd = pos0 // exclusive end of current sub-block's data
    var bitBuf = 0L; var bitCnt = 0
    def fill(): Boolean = { // ensure >= codeSize bits or fail
      while (bitCnt < codeSize) {
        if (pos == blockEnd) {
          if (pos >= b.length) return false
          val n = b(pos) & 0xff
          if (n == 0) return false // terminator before EOI
          pos += 1; blockEnd = pos + n
          if (blockEnd > b.length) return false
        } else {
          bitBuf |= (b(pos) & 0xff).toLong << bitCnt; bitCnt += 8; pos += 1
        }
      }
      true
    }
    def writeString(code: Int): Boolean = {
      val len = length(code)
      if (outLen + len > expected) return false
      var p = outLen + len - 1; var c = code
      while (c >= 0) { out(p) = tail(c); p -= 1; c = prefix(c) }
      outLen += len
      true
    }
    while (true) {
      if (!fill()) return None
      val code = (bitBuf & ((1 << codeSize) - 1)).toInt
      bitBuf >>>= codeSize; bitCnt -= codeSize
      if (code == clear) {
        next = eoi + 1; codeSize = minCode + 1; prev = -1
      } else if (code == eoi) {
        if (outLen != expected) return None
        // drain the remaining sub-blocks to the 0 terminator so the
        // caller can resume at the next container block
        var p = blockEnd
        var done = false
        while (!done) {
          if (p >= b.length) return None
          val n = b(p) & 0xff
          p += 1
          if (n == 0) done = true else p += n
        }
        return Some((out, p))
      } else if (prev == -1) {
        if (code >= clear) return None
        if (!writeString(code)) return None
        prev = code
      } else if (next > 4095) {
        // dictionary full: codes reference existing entries only, no adds,
        // until the encoder's clear arrives (12-bit codes cap at 4095, so
        // the KwKwK next-slot case cannot occur here)
        if (code >= next) return None
        if (!writeString(code)) return None
        prev = code
      } else {
        if (code > next) return None
        val cur = if (code == next) prev else code // KwKwK uses prev + head(prev)
        // the new entry is prev + head(cur); for KwKwK head(cur)=head(prev)
        var h = cur
        while (prefix(h) >= 0) h = prefix(h)
        prefix(next) = prev; tail(next) = tail(h)
        length(next) = length(prev) + 1
        if (code == next) { if (!writeString(next)) return None }
        else if (!writeString(code)) return None
        next += 1
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = code
      }
    }
    None // unreachable
  }
}
