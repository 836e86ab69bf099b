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
    val got = Media.extractFeatures(media, Media.StubDecoder)
      .collect().map(f => f.id -> f).toMap
    got(1L).byte_len shouldBe 11L
    got(1L).content_hash shouldBe PolyHash.hash("hello world", 31L)
    got(2L).content_hash shouldBe PolyHash.hash("spark native engine", 31L)
    got.values.foreach { f =>
      f.width should (be >= 64 and be < 1920)
      f.height should (be >= 64 and be < 1080)
      f.frames should (be >= 1 and be <= 32)
    }
  }

  "HeaderDecoder" should "round-trip real PNG and WAV headers" in {
    val recs = Seq(
      Media.MediaRecord(1L, "image/png", Media.pngBytes(640, 480)),
      Media.MediaRecord(2L, "audio/wav", Media.wavBytes(44100, 2, 100)),
      Media.MediaRecord(3L, "mislabeled", Media.pngBytes(7, 9)), // magic wins
      Media.MediaRecord(4L, "text/plain", "not a media file".getBytes("UTF-8")))
    val got = Media.HeaderDecoder.decode(recs.iterator).toSeq.map(f => f.id -> f).toMap
    got(1L).width shouldBe 640
    got(1L).height shouldBe 480
    got(1L).frames shouldBe 1
    got(1L).byte_len shouldBe 45L
    got(2L).width shouldBe 44100  // sample rate
    got(2L).height shouldBe 2     // channels
    got(2L).frames shouldBe 100   // sample frames = data / blockAlign
    got(2L).byte_len shouldBe (44L + 100 * 2 * 2)
    got(3L).width shouldBe 7      // detected by magic bytes, not mime
    got(4L).width shouldBe -1     // unknown format: honest -1, not a fake
    got(4L).frames shouldBe -1
    // content hash is the same byte fold regardless of decoder
    got(4L).content_hash shouldBe PolyHash.hash("not a media file", 31L)
  }

  it should "survive a truncated WAV without a data chunk" in {
    val bytes = Media.wavBytes(8000, 1, 4).take(20) // RIFF+WAVE+partial fmt
    val f = Media.HeaderDecoder.decode(
      Iterator(Media.MediaRecord(9L, "audio/wav", bytes))).next()
    f.frames shouldBe -1
  }

  it should "degrade on corrupt WAV chunk sizes instead of hanging or throwing" in {
    // chunk size is untrusted: a negative size once made the walk loop
    // spin (advance <= 0) and a huge one wrapped the offset negative
    def wavWithChunkSize(size: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(20)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(12)
      b.put("WAVE".getBytes("US-ASCII"))
      b.put("junk".getBytes("US-ASCII")).putInt(size)
      b.array()
    }
    for (size <- Seq(-8, -1, Int.MaxValue)) {
      val f = Media.HeaderDecoder.decode(Iterator(
        Media.MediaRecord(7L, "audio/wav", wavWithChunkSize(size)))).next()
      (f.width, f.height, f.frames) shouldBe ((-1, -1, -1))
    }
  }

  it should "skip unrecognized payloads (frames = -1) in sampleFrames" in {
    val mixed = Media.asMedia(
      Seq((1L, "image/png", Media.pngBytes(4, 4)),
        (2L, "text/plain", "no media here".getBytes("UTF-8")))
        .toDF("doc_id", "mime", "bytes"),
      col("doc_id"), col("mime"), col("bytes"))
    val got = Media.sampleFrames(Media.extractFeatures(mixed), every = 1)
      .select("id").as[Long].collect()
    got shouldBe Array(1L) // the PNG's single frame; the text row drops
  }

  "SampleStatsDecoder" should
    "recover exact pixel stats from a padded 24-bit BMP" in {
    // width 3 → rowBytes 9, stride 12: three pad bytes per row. The pads
    // are zero; if the decoder counted them, min/mean/count would all be
    // wrong for this fixture (values 10..27, none zero).
    val bmp = Media.bmpBytes(3, 2, j => 10 + j) // 18 samples: 10..27
    val st = Media.SampleStatsDecoder.decodeStats(
      Iterator(Media.MediaRecord(1L, "image/bmp", bmp))).next()
    st.n_samples shouldBe 18L
    st.min_val shouldBe 10L
    st.max_val shouldBe 27L
    st.mean_val shouldBe (10 to 27).sum.toDouble / 18
  }

  it should "reject an adversarial BMP width instead of emitting garbage stats" in {
    // w = 715827883 makes w*3 overflow Int to a NEGATIVE stride that
    // would slip past an Int bounds check and "succeed" with zero/garbage
    // samples; the Long geometry math must yield NO stats row instead
    val b = java.nio.ByteBuffer.allocate(100)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(2, 100)          // file size
    b.putInt(10, 54)          // pixel data offset
    b.putInt(14, 40)          // DIB header size
    b.putInt(18, 715827883)   // width: w*3 = 2^31 + 1
    b.putInt(22, 1)           // height
    b.putShort(26, 1)         // planes
    b.putShort(28, 24)        // bpp
    b.putInt(30, 0)           // BI_RGB
    Media.SampleStatsDecoder.bmpPixels(b.array()) shouldBe None
    Media.SampleStatsDecoder.decodeStats(
      Iterator(Media.MediaRecord(9L, "image/bmp", b.array()))).toSeq shouldBe empty
  }

  it should "recover signed 16-bit PCM sample stats" in {
    val wav = Media.wavBytesPcm(8000, 2, 3, i => (i * 100 - 250).toShort)
    val st = Media.SampleStatsDecoder.decodeStats(
      Iterator(Media.MediaRecord(2L, "audio/wav", wav))).next()
    st.n_samples shouldBe 6L // 3 frames x 2 channels
    st.min_val shouldBe -250L
    st.max_val shouldBe 250L
    st.mean_val shouldBe Seq(-250, -150, -50, 50, 150, 250).sum.toDouble / 6
  }

  it should "recover PNG pixel stats through inflate + all five scanline filters" in {
    // height 7 ≥ 5 → rows carry filter types 0,1,2,3,4,0,1 — every
    // reconstruction path runs; values are the full 0..255 wrap so the
    // unfilter arithmetic is exercised across the byte range
    val w = 5; val h = 7; val n = w * h * 3
    val png = Media.pngBytesPixels(w, h, j => (j * 37 + 11) % 256)
    val st = Media.SampleStatsDecoder.decodeStats(
      Iterator(Media.MediaRecord(7L, "image/png", png))).next()
    val vals = (0 until n).map(j => (j * 37 + 11) % 256)
    st.n_samples shouldBe n.toLong
    st.min_val shouldBe vals.min.toLong
    st.max_val shouldBe vals.max.toLong
    st.mean_val shouldBe vals.sum.toDouble / n
  }

  it should "decode gray, gray+alpha, and RGBA PNGs (bpp-dependent filters)" in {
    // Sub/Average/Paeth reconstruct against the previous PIXEL (bpp
    // bytes back) — a wrong bpp corrupts every row of type 1/3/4, so
    // exercising each color type pins the channel-count plumbing
    for ((ct, ch) <- Seq(0 -> 1, 4 -> 2, 6 -> 4)) {
      val w = 4; val h = 6; val n = w * h * ch
      val png = Media.pngBytesPixels(w, h, j => (j * 53 + 5) % 256, colorType = ct)
      val st = Media.SampleStatsDecoder.decodeStats(
        Iterator(Media.MediaRecord(ct.toLong, "image/png", png))).next()
      val vals = (0 until n).map(j => (j * 53 + 5) % 256)
      withClue(s"colorType $ct:") {
        st.n_samples shouldBe n.toLong
        st.min_val shouldBe vals.min.toLong
        st.max_val shouldBe vals.max.toLong
        st.mean_val shouldBe vals.sum.toDouble / n
      }
    }
  }

  it should "decode palette PNGs through PLTE expansion" in {
    val palette = Array[Byte](10, 20, 30, 100, (200 & 0xff).toByte, 50, 0, 1, 2)
    val w = 4; val h = 6 // 6 rows: every filter type occurs
    val idx = (j: Int) => (j * 2 + 1) % 3
    val png = Media.pngBytesPixels(w, h, idx, colorType = 3, palette = palette)
    val got = Media.SampleStatsDecoder.pngPixels(png).get
    got._1 shouldBe w; got._2 shouldBe h; got._3 shouldBe 3
    val expected = (0 until w * h).flatMap { j =>
      val k = idx(j); Seq(palette(k * 3), palette(k * 3 + 1), palette(k * 3 + 2))
    }
    got._4.toSeq shouldBe expected
  }

  it should "decode 16-bit PNGs keeping the most-significant byte" in {
    // libpng strip-16 reduction: sample j = f(j) >> 8. Values span the
    // full 16-bit range so a low-byte mixup cannot pass by accident.
    for ((ct, ch) <- Seq(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)) {
      val w = 5; val h = 7; val n = w * h * ch
      val f = (j: Int) => (j * 4099 + 17) % 65536
      val png = Media.pngBytesPixels(w, h, f, colorType = ct, bitDepth = 16)
      val got = Media.SampleStatsDecoder.pngPixels(png).get
      withClue(s"colorType $ct:") {
        got._1 shouldBe w; got._2 shouldBe h; got._3 shouldBe ch
        got._4.map(_ & 0xff).toSeq shouldBe (0 until n).map(f(_) >> 8)
      }
    }
  }

  it should "decode sub-byte gray depths with exact bit replication" in {
    // scale = 255/(2^d - 1): d=1 -> 255, d=2 -> 85, d=4 -> 17. Width 13
    // leaves a partial final packed byte at d=2/4 (13·d not a multiple
    // of 8), pinning the bit-packing boundary.
    for (d <- Seq(1, 2, 4)) {
      val w = 13; val h = 6; val mask = (1 << d) - 1
      val scale = 255 / mask
      val f = (j: Int) => (j * 3 + 1) & mask
      val png = Media.pngBytesPixels(w, h, f, colorType = 0, bitDepth = d)
      val got = Media.SampleStatsDecoder.pngPixels(png).get
      withClue(s"depth $d:") {
        got._3 shouldBe 1
        got._4.map(_ & 0xff).toSeq shouldBe (0 until w * h).map(f(_) * scale)
      }
    }
  }

  it should "decode sub-byte palette indexes raw through PLTE" in {
    // indexes are NOT bit-replicated — a depth-2 index 3 must hit PLTE
    // entry 3, not entry 255
    val palette = Array[Byte](10, 11, 12, 20, 21, 22, 30, 31, 32, 40, 41, 42)
    val w = 9; val h = 6
    val idx = (j: Int) => (j * 2 + 1) % 4
    val png = Media.pngBytesPixels(w, h, idx, colorType = 3,
      palette = palette, bitDepth = 2)
    val got = Media.SampleStatsDecoder.pngPixels(png).get
    got._3 shouldBe 3
    val expected = (0 until w * h).flatMap { j =>
      val k = idx(j); Seq(palette(k * 3), palette(k * 3 + 1), palette(k * 3 + 2))
    }
    got._4.toSeq shouldBe expected
  }

  it should "reassemble Adam7-interlaced PNGs identically to sequential" in {
    // geometries straddling the 8x8 Adam7 tile: partial passes, empty
    // passes (w or h < the pass origin), and the degenerate 1x1
    for ((w, h) <- Seq(13 -> 11, 8 -> 8, 5 -> 3, 2 -> 9, 1 -> 1, 16 -> 4)) {
      val f = (j: Int) => (j * 37 + 11) % 256
      val seqPng = Media.pngBytesPixels(w, h, f)
      val intPng = Media.pngBytesPixels(w, h, f, interlaced = true)
      val a = Media.SampleStatsDecoder.pngPixels(seqPng).get
      val b = Media.SampleStatsDecoder.pngPixels(intPng).get
      withClue(s"${w}x$h:") {
        b._1 shouldBe a._1; b._2 shouldBe a._2; b._3 shouldBe a._3
        b._4.toSeq shouldBe a._4.toSeq
      }
    }
  }

  it should "decode interlaced 16-bit and interlaced sub-byte palette PNGs" in {
    // the two reductions compose with pass reassembly
    val f16 = (j: Int) => (j * 2999 + 5) % 65536
    val p16 = Media.pngBytesPixels(11, 9, f16, colorType = 2,
      bitDepth = 16, interlaced = true)
    val g16 = Media.SampleStatsDecoder.pngPixels(p16).get
    g16._4.map(_ & 0xff).toSeq shouldBe (0 until 11 * 9 * 3).map(f16(_) >> 8)

    val palette = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    val idx = (j: Int) => j % 3
    val pp = Media.pngBytesPixels(10, 7, idx, colorType = 3,
      palette = palette, bitDepth = 4, interlaced = true)
    val gp = Media.SampleStatsDecoder.pngPixels(pp).get
    gp._4.toSeq shouldBe (0 until 10 * 7).flatMap { j =>
      val k = idx(j); Seq(palette(k * 3), palette(k * 3 + 1), palette(k * 3 + 2))
    }
  }

  it should "refuse illegal depth/type combinations and unknown interlace" in {
    val ok = Media.pngBytesPixels(4, 4, j => j % 256)
    val badDepth = ok.clone(); badDepth(24) = 2 // depth 2 RGB: illegal
    Media.SampleStatsDecoder.pngPixels(badDepth) shouldBe None
    val badInterlace = ok.clone(); badInterlace(28) = 7
    Media.SampleStatsDecoder.pngPixels(badInterlace) shouldBe None
  }

  it should "refuse palette images with out-of-range indexes or no PLTE" in {
    val palette = Array[Byte](1, 2, 3, 4, 5, 6) // 2 entries
    val bad = Media.pngBytesPixels(3, 3, _ => 2, colorType = 3,
      palette = palette) // index 2 >= 2 entries
    Media.SampleStatsDecoder.pngPixels(bad) shouldBe None
    // strip the PLTE chunk: sig(8) + IHDR(25) then PLTE(12+6)
    val ok = Media.pngBytesPixels(3, 3, _ => 1, colorType = 3,
      palette = palette)
    val noPlte = ok.take(33) ++ ok.drop(33 + 12 + 6)
    Media.SampleStatsDecoder.pngPixels(noPlte) shouldBe None
  }

  it should "emit no row for payloads it cannot truly decode" in {
    val full = Media.pngBytesPixels(6, 6, j => j)
    val recs = Seq(
      Media.MediaRecord(1L, "image/png", Media.pngBytes(4, 4)), // no IDAT
      Media.MediaRecord(2L, "text/plain", "BMno, too short".getBytes("UTF-8")),
      Media.MediaRecord(3L, "audio/wav", Media.wavBytes(8000, 1, 4).take(20)),
      // truncated mid-IDAT: inflate cannot fill the declared geometry
      Media.MediaRecord(4L, "image/png", full.take(full.length - 16)))
    Media.SampleStatsDecoder.decodeStats(recs.iterator).toSeq shouldBe empty
  }

  "resizeImages" should "nearest-neighbor halve a PNG and re-encode exactly" in {
    // 4×2 RGB, pixel (x,y) channel c value = y·100 + x·10 + c
    def v(j: Int): Int = { val p = j / 3; (p / 4) * 100 + (p % 4) * 10 + j % 3 }
    val rec = Media.MediaRecord(9L, "image/png", Media.pngBytesPixels(4, 2, v))
    val out = Media.resizeImages(Seq(rec).toDS(), factor = 2).collect()
    out.length shouldBe 1
    out.head.mime shouldBe "image/png"
    // 2×1 target: (x2,y2) ← (x2·4/2, y2·2/1) = sources (0,0) and (2,0)
    val got = Media.SampleStatsDecoder.pngPixels(out.head.bytes).get
    got._1 shouldBe 2; got._2 shouldBe 1; got._3 shouldBe 3
    got._4.map(_ & 0xff).toSeq shouldBe Seq(0, 1, 2, 20, 21, 22)
  }

  it should "resize BMP input (bottom-up rows flipped) and emit PNG" in {
    // 2×2 BMP stored bottom-up: file rows are (y=1, y=0). Channel byte j
    // in FILE order = j·5 % 256; raster-order pixel (x,y=0) is thus the
    // SECOND stored row. Halving to 1×1 must pick raster (0,0).
    val rec = Media.MediaRecord(3L, "image/bmp", Media.bmpBytes(2, 2, j => j * 5))
    val out = Media.resizeImages(Seq(rec).toDS(), factor = 2).collect()
    out.length shouldBe 1
    val got = Media.SampleStatsDecoder.pngPixels(out.head.bytes).get
    got._1 shouldBe 1; got._2 shouldBe 1
    // raster row 0 = SECOND file row = f(6..8)·5 for its first pixel
    got._4.map(_ & 0xff).toSeq shouldBe Seq(30, 35, 40)
  }

  it should "drop undecodable payloads instead of faking a resize" in {
    val recs = Seq(
      Media.MediaRecord(1L, "image/png", Media.pngBytes(4, 4)), // no IDAT
      Media.MediaRecord(2L, "text/plain", "not an image".getBytes("UTF-8")))
    Media.resizeImages(recs.toDS(), factor = 2).collect() shouldBe empty
  }

  "Avi.encode/framePixels" should "round-trip frames exactly across geometries" in {
    import graft.multimodal.Avi
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 30) {
      val w = 1 + rnd.nextInt(9) // widths 1..9 hit all 4 stride paddings
      val h = 1 + rnd.nextInt(5)
      val nf = 1 + rnd.nextInt(6)
      val frames = (0 until nf).map { _ =>
        val f = new Array[Byte](w * h * 3); rnd.nextBytes(f); f
      }
      val bytes = Avi.encode(w, h, frames)
      Avi.isAvi(bytes) shouldBe true
      Avi.dimensions(bytes) shouldBe Some((w, h, nf))
      val got = Avi.framePixels(bytes).get
      got._1 shouldBe w; got._2 shouldBe h
      got._3.size shouldBe nf
      got._3.zip(frames).foreach { case (g, e) => g.toSeq shouldBe e.toSeq }
    }
  }

  it should "return None loudly on truncation and non-AVI payloads" in {
    import graft.multimodal.Avi
    val ok = Avi.encode(4, 3, Seq(Array.fill[Byte](36)(7)))
    Avi.framePixels(ok) should not be None
    // truncated mid-frame: the walk must refuse, not return a short clip
    Avi.framePixels(ok.take(ok.length - 10)) shouldBe None
    Avi.dimensions("RIFFxxxxWAVE".getBytes("US-ASCII")) shouldBe None
    Avi.framePixels(Array[Byte](1, 2, 3)) shouldBe None
  }

  it should "refuse mismatched fourccs even when chunk sizes fit the DIB geometry" in {
    import graft.multimodal.Avi
    // patch the strh fccHandler ('DIB ' at strh+12: tag, size, 'vids')
    // to MJPG: the chunks hold raw DIB bytes, not JPEG streams, so the
    // MJPG path must refuse them (and without the handler dispatch they
    // would "decode" as garbage rasters); an unknown fourcc refuses too
    val ok = Avi.encode(4, 3, Seq(Array.fill[Byte](36)(7)))
    val strh = ok.indexOfSlice("strh".getBytes("US-ASCII"))
    strh should be > 0
    val mjpg = ok.clone()
    System.arraycopy("MJPG".getBytes("US-ASCII"), 0, mjpg, strh + 12, 4)
    Avi.framePixels(mjpg) shouldBe None
    val h264 = ok.clone()
    System.arraycopy("H264".getBytes("US-ASCII"), 0, h264, strh + 12, 4)
    Avi.framePixels(h264) shouldBe None
    // container geometry stays readable — dimensions() is header-only
    Avi.dimensions(mjpg) shouldBe Some((4, 3, 1))
  }

  it should "round-trip Motion-JPEG clips bit-exactly on the block-constant family" in {
    import graft.multimodal.Avi
    // gray-valued (B=G=R) block-constant frames at unit quant are the
    // bit-exact JPEG family, so MJPG round trips EXACTLY: frame f's 8×8
    // block b holds value (f·31 + b·17 + 5) % 256 in all three channels
    val w = 16; val h = 24 // 2×3 blocks per frame
    val frames = (0 until 4).map { f =>
      Array.tabulate[Byte](w * h * 3) { i =>
        val p = i / 3; val x = p % w; val y = p / w
        val b = (y / 8) * (w / 8) + x / 8
        ((f * 31 + b * 17 + 5) % 256).toByte
      }
    }
    val avi = Avi.encodeMjpg(w, h, frames)
    Avi.dimensions(avi) shouldBe Some((w, h, 4))
    val (gw, gh, got) = Avi.framePixels(avi).get
    gw shouldBe w; gh shouldBe h; got.size shouldBe 4
    for (f <- 0 until 4)
      withClue(s"frame $f:") { got(f).toSeq shouldBe frames(f).toSeq }
  }

  it should "decode lossy MJPG within a bounded error and refuse wrong-geometry frames" in {
    import graft.multimodal.Avi
    val w = 16; val h = 16
    val frames = Seq(Array.tabulate[Byte](w * h * 3)(i => ((i * 7) % 256).toByte))
    val lossy = Avi.encodeMjpg(w, h, frames, quality = 85)
    val (_, _, got) = Avi.framePixels(lossy).get
    val maxErr = got.head.zip(frames.head)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    maxErr should be <= 64 // standard tables at q85 on noisy content
    // a frame whose JPEG dims disagree with the container: loud None.
    // patch the avih width (data offset +32) so container ≠ frame geometry
    val wrongDims = Avi.encodeMjpg(w, h, frames)
    val avih = wrongDims.indexOfSlice("avih".getBytes("US-ASCII"))
    avih should be > 0
    wrongDims(avih + 8 + 32) = (w + 8).toByte // little-endian low byte
    Avi.dimensions(wrongDims) shouldBe Some((w + 8, h, 1))
    Avi.framePixels(wrongDims) shouldBe None
    // and truncation mid-chunk refuses rather than yielding a short clip
    val good = Avi.encodeMjpg(w, h, frames)
    Avi.framePixels(good.take(good.length - 6)) shouldBe None
  }

  "Avi.frameStats" should "sample every k-th frame with exact stats" in {
    import graft.multimodal.Avi
    // frame f: all bytes = 10·f → mean 10f, min=max=10f; every=2 → 0,2,4
    val frames = (0 until 5).map(f => Array.fill[Byte](3 * 2 * 3)((10 * f).toByte))
    val rec = Media.MediaRecord(9L, "video/avi", Avi.encode(3, 2, frames))
    val bad = Media.MediaRecord(10L, "video/avi", Array[Byte](9, 9, 9))
    val got = Avi.frameStats(Seq(rec, bad).toDS(), every = 2)
      .as[(Long, Int, Long, Double, Long, Long)].collect().sortBy(_._2)
    got.map(_._1).distinct.toSeq shouldBe Seq(9L) // undecodable dropped
    got.map(_._2).toSeq shouldBe Seq(0, 2, 4)
    got.foreach { case (_, f, n, mean, mn, mx) =>
      n shouldBe 18L
      mean shouldBe 10.0 * f
      mn shouldBe 10L * f; mx shouldBe 10L * f
    }
  }

  "HeaderDecoder" should "report AVI container geometry as frames" in {
    import graft.multimodal.Avi
    val rec = Media.MediaRecord(4L, "video/avi",
      Avi.encode(6, 4, (0 until 3).map(_ => new Array[Byte](72))))
    val f = Media.extractFeatures(Seq(rec).toDS()).collect().head
    (f.width, f.height, f.frames) shouldBe ((6, 4, 3))
  }

  "Media.resampleAudio" should "decimate and mix down with truncating division" in {
    // stereo frames: (L, R) pairs; mixdown = (L+R)/2 truncated toward
    // zero — frame 2's sum is odd NEGATIVE, the case where floor and
    // truncation disagree (-61/2 → -30, not -31)
    val samples = Array[Short](10, 21, 5, 5, -30, -31, 7, 8, 100, 101, 2, 3)
    val rec = Media.MediaRecord(1L, "audio/wav",
      Media.wavBytesPcm(8000, 2, 6, i => samples(i)))
    val out = Media.resampleAudio(Seq(rec).toDS(), decimate = 2, mixdown = true)
      .collect().head
    val got = Media.wavPcm(out.bytes).get
    got._1 shouldBe 4000 // rate / decimate
    got._2 shouldBe 1 // mono
    // kept frames 0, 2, 4 → (10+21)/2=15, (-30-31)/2=-30, (100+101)/2=100
    got._3.toSeq shouldBe Seq[Short](15, -30, 100)
  }

  it should "keep channels when mixdown is off and drop indivisible rates" in {
    val samples = Array[Short](1, 2, 3, 4, 5, 6, 7, 8)
    val stereo = Media.MediaRecord(1L, "audio/wav",
      Media.wavBytesPcm(8000, 2, 4, i => samples(i)))
    val odd = Media.MediaRecord(2L, "audio/wav",
      Media.wavBytesPcm(8001, 1, 4, i => samples(i)))
    val notWav = Media.MediaRecord(3L, "audio/wav", Array[Byte](1, 2, 3))
    val out = Media.resampleAudio(Seq(stereo, odd, notWav).toDS(),
      decimate = 2, mixdown = false).collect()
    out.map(_.id).toSeq shouldBe Seq(1L) // 8001 % 2 != 0 → loud drop
    val got = Media.wavPcm(out.head.bytes).get
    got._2 shouldBe 2
    got._3.toSeq shouldBe Seq[Short](1, 2, 5, 6) // frames 0 and 2, both channels
  }

  "Media.wavPcm" should "refuse a truncated data chunk rather than decode a partial clip" in {
    val full = Media.wavBytesPcm(8000, 1, 8, i => (i * 3).toShort)
    Media.wavPcm(full) should not be None
    // declared data size now exceeds the remaining bytes: loud None (the
    // resampleAudio / Avi.framePixels policy), never a silent clamp
    Media.wavPcm(full.dropRight(2)) shouldBe None
  }

  "HeaderDecoder over FLAC" should "report STREAMINFO geometry header-only" in {
    import graft.multimodal.Flac
    val pcm = Array.tabulate(777)(i => (i * 31) % 9000 - 4500)
    val rec = Media.MediaRecord(4L, "audio/flac",
      Flac.encode(22050, Array(pcm, pcm), blockSize = 256,
        mode = Flac.Mode.MidSide))
    val f = Media.HeaderDecoder.decode(Iterator(rec)).next()
    // WAV's (rate, channels, frames) feature shape
    f.width shouldBe 22050; f.height shouldBe 2; f.frames shouldBe 777
    // and the stats path decodes the true samples
    val st = Media.SampleStatsDecoder.decodeStats(Iterator(rec)).next()
    st.n_samples shouldBe 777L * 2
    st.min_val shouldBe pcm.min.toLong
    st.max_val shouldBe pcm.max.toLong
  }

  "imageDHash" should "compute the hand-derived gradient hash on a synthetic ramp" in {
    // 9×8 RGB with a horizontal brightness ramp: gray(x,y) = x·20, so
    // every right neighbor is strictly brighter → all 64 bits set.
    val ramp = Media.MediaRecord(1L, "image/png",
      Media.pngBytesPixels(9, 8, j => ((j / 3) % 9) * 20))
    // Reverse ramp: gray(x,y) = (8−x)·20 → no bit set.
    val rev = Media.MediaRecord(2L, "image/png",
      Media.pngBytesPixels(9, 8, j => (8 - (j / 3) % 9) * 20))
    val got = Media.imageDHash(Seq(ramp, rev).toDS())
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    got(1L) shouldBe ((0xffffffffL, 0xffffffffL))
    got(2L) shouldBe ((0L, 0L))
  }

  it should "be invariant to a non-clipping brightness shift but not to content" in {
    def img(id: Long, shift: Int, seed: Int) = Media.MediaRecord(id, "image/png",
      Media.pngBytesPixels(12, 10, j => (j * seed % 100) + 50 + shift))
    val Seq(a, b, c) = Media.imageDHash(
        Seq(img(1, 0, 7), img(2, 40, 7), img(3, 0, 13)).toDS())
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    (a._2, a._3) shouldBe ((b._2, b._3)) // +40 everywhere: gradients unchanged
    (a._2, a._3) should not be ((c._2, c._3)) // different content
  }

  it should "hash BMP input identically to the same pixels as PNG" in {
    // bmpBytes takes FILE-order (bottom-up) bytes; flip rows so the BMP's
    // raster content equals the PNG's (gray sums make BGR-vs-RGB moot)
    val rowB = 6 * 3
    def v(j: Int): Int = (j * 31 + 5) % 256
    def vb(j: Int): Int = v((3 - j / rowB) * rowB + j % rowB)
    val png = Media.MediaRecord(1L, "image/png", Media.pngBytesPixels(6, 4, v))
    val bmp = Media.MediaRecord(2L, "image/bmp", Media.bmpBytes(6, 4, vb))
    val got = Media.imageDHash(Seq(png, bmp).toDS())
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    got(1L) shouldBe got(2L)
  }

  it should "drop undecodable payloads" in {
    val recs = Seq(
      Media.MediaRecord(1L, "image/png", Media.pngBytes(4, 4)), // header-only
      Media.MediaRecord(2L, "text/plain", "not an image".getBytes("UTF-8")))
    Media.imageDHash(recs.toDS()).count() shouldBe 0L
  }

  "sampleFrames" should "emit stride-sampled frame indexes" in {
    val feats = Media.extractFeatures(media, Media.StubDecoder)
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
