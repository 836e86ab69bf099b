package graft

import graft.multimodal.{Jpeg, Media}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Pure-JVM baseline JPEG codec: exact round trips for the gate's
  * block-constant fixtures, bounded error for arbitrary images, loud
  * None for everything outside baseline scope. No Spark needed — the
  * codec is plain JVM code the media operators mapPartition over. */
class JpegSpec extends AnyFlatSpec with Matchers {

  /** Block-constant gray image: 8×8 block (bx,by) has the single value
    * `f(blockIndex)`. */
  private def grayBlocks(w: Int, h: Int, f: Int => Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      out(y * w + x) = (f((y / 8) * (w / 8) + (x / 8)) & 0xff).toByte
    out
  }

  /** Gray-valued RGB (R=G=B) with constant 8×8 blocks — the color-exact
    * fixture family (Y = v, Cb = Cr = 128 exactly). */
  private def grayRgbBlocks(w: Int, h: Int, f: Int => Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      out((y * w + x) * 3 + c) = (f((y / 8) * (w / 8) + (x / 8)) & 0xff).toByte
    out
  }

  "encodeGray/decodePixels" should "round-trip block-constant images bit-exactly at unit quant" in {
    // 100 geometries × value patterns: every (bw, bh) in 1..10 × 1..10
    for (bw <- 1 to 10; bh <- 1 to 10) {
      val w = bw * 8; val h = bh * 8
      val pix = grayBlocks(w, h, b => (b * 23 + bw * 7 + bh * 3 + 1) % 256)
      val dec = Jpeg.decodePixels(Jpeg.encodeGray(w, h, pix))
      withClue(s"${w}x$h: ") {
        dec.map { case (dw, dh, ch, p) => (dw, dh, ch, p.toSeq) } shouldBe
          Some((w, h, 1, pix.toSeq))
      }
    }
  }

  it should "round-trip exactly with restart markers at every interval" in {
    val w = 40; val h = 24 // 15 MCUs
    val pix = grayBlocks(w, h, b => (b * 41 + 5) % 256)
    for (ri <- 1 to 16) {
      val dec = Jpeg.decodePixels(Jpeg.encodeGray(w, h, pix, restartInterval = ri))
      withClue(s"restartInterval=$ri: ") {
        dec.map(_._4.toSeq) shouldBe Some(pix.toSeq)
      }
    }
  }

  "encodeRgb/decodePixels" should "round-trip gray-valued block-constant color exactly (4:4:4 and 4:2:0)" in {
    for (sub <- Seq(false, true); bw <- 1 to 4; bh <- 1 to 4) {
      // 4:2:0 wants dims that are multiples of 16 so every luma AND
      // chroma block is constant; 4:4:4 only needs multiples of 8
      val unit = if (sub) 16 else 8
      val w = bw * unit; val h = bh * unit
      val rgb = grayRgbBlocks(w, h, b => (b * 37 + 11) % 256)
      val dec = Jpeg.decodePixels(Jpeg.encodeRgb(w, h, rgb, subsample420 = sub))
      withClue(s"${w}x$h sub=$sub: ") {
        dec.map { case (dw, dh, ch, p) => (dw, dh, ch, p.toSeq) } shouldBe
          Some((w, h, 3, rgb.toSeq))
      }
    }
  }

  it should "decode arbitrary RGB within a small error bound at unit quant" in {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 20) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val sub = trial % 2 == 0
      Jpeg.decodePixels(Jpeg.encodeRgb(w, h, rgb, subsample420 = false)) match {
        case Some((dw, dh, ch, p)) =>
          dw shouldBe w; dh shouldBe h; ch shouldBe 3
          // 4:4:4 unit-quant error: DCT forward rounding (≤0.5/coef) +
          // YCbCr 8-bit round trip — a handful of counts, never more
          val maxErr = p.zip(rgb).map { case (a, b) =>
            math.abs((a & 0xff) - (b & 0xff))
          }.max
          withClue(s"${w}x$h sub=$sub maxErr=$maxErr: ") { maxErr should be <= 8 }
        case None => fail(s"decode failed for ${w}x$h")
      }
    }
  }

  it should "stay within a sane error bound with standard tables at quality 85" in {
    val rnd = new scala.util.Random(7)
    val w = 56; val h = 40
    // smooth gradient + mild noise: the content JPEG is built for
    val rgb = Array.tabulate[Byte](w * h * 3) { i =>
      val p = i / 3; val x = p % w; val y = p / w
      ((x * 3 + y * 2 + rnd.nextInt(8)) % 256).toByte
    }
    val enc = Jpeg.encodeRgb(w, h, rgb,
      Jpeg.scaledQuant(Jpeg.StdLumaQuant, 85),
      Jpeg.scaledQuant(Jpeg.StdChromaQuant, 85), subsample420 = true)
    val (_, _, _, p) = Jpeg.decodePixels(enc).get
    val errs = p.zip(rgb).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }
    (errs.sum.toDouble / errs.length) should be < 16.0
    // and it should actually compress the smooth content
    enc.length should be < rgb.length
  }

  "decodePixels" should "handle non-multiple-of-MCU dimensions" in {
    val rnd = new scala.util.Random(3)
    for ((w, h) <- Seq((9, 7), (17, 15), (23, 1), (1, 23), (31, 18))) {
      val pix = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
      Jpeg.decodePixels(Jpeg.encodeGray(w, h, pix)) match {
        case Some((dw, dh, ch, p)) =>
          (dw, dh, ch) shouldBe ((w, h, 1))
          val maxErr = p.zip(pix).map { case (a, b) =>
            math.abs((a & 0xff) - (b & 0xff))
          }.max
          withClue(s"${w}x$h: ") { maxErr should be <= 8 }
        case None => fail(s"decode failed for ${w}x$h")
      }
    }
  }

  it should "reject truncated, corrupted, and non-baseline payloads loudly" in {
    val good = Jpeg.encodeGray(16, 16, grayBlocks(16, 16, _ * 50 % 256))
    Jpeg.decodePixels(good) should not be None
    // truncation anywhere in the entropy data
    Jpeg.decodePixels(good.take(good.length - 10)) shouldBe None
    Jpeg.decodePixels(good.take(30)) shouldBe None
    Jpeg.decodePixels(Array[Byte]()) shouldBe None
    Jpeg.decodePixels("not a jpeg".getBytes("UTF-8")) shouldBe None
    // flip SOF0 to SOF2 on a BASELINE body: the single full-band scan is
    // malformed as a progressive scan header (Ss=0 demands Se=0) — loud
    // None, never a wrong decode
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    Jpeg.decodePixels(prog) shouldBe None
    // but dimensions still reports the geometry (header-only)
    Jpeg.dimensions(prog) shouldBe Some((16, 16, 1))
  }

  "progressive" should "round-trip block-constant images bit-exactly at unit quant" in {
    for (bw <- 1 to 6; bh <- 1 to 6) {
      val w = bw * 8; val h = bh * 8
      val pix = grayBlocks(w, h, b => (b * 23 + bw * 7 + bh * 3 + 1) % 256)
      val dec = Jpeg.decodePixels(Jpeg.encodeProgressiveGray(w, h, pix))
      withClue(s"${w}x$h: ") {
        dec.map { case (dw, dh, ch, p) => (dw, dh, ch, p.toSeq) } shouldBe
          Some((w, h, 1, pix.toSeq))
      }
    }
  }

  it should "decode identically to baseline on arbitrary images" in {
    // the scan script re-orders the SAME quantized coefficients, so the
    // progressive decode must equal the baseline decode bit-for-bit —
    // any slip in spectral bands, EOB runs, or refinement breaks this
    var seed = 98765L
    def nxt(): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % 256).toInt
    }
    for ((w, h) <- Seq(8 -> 8, 24 -> 16, 17 -> 9, 40 -> 33, 7 -> 5)) {
      val gray = Array.fill[Byte](w * h)(nxt().toByte)
      val a = Jpeg.decodePixels(Jpeg.encodeGray(w, h, gray)).get
      val b = Jpeg.decodePixels(Jpeg.encodeProgressiveGray(w, h, gray)).get
      withClue(s"gray ${w}x$h: ") { b._4.toSeq shouldBe a._4.toSeq }
      val rgb = Array.fill[Byte](w * h * 3)(nxt().toByte)
      val c = Jpeg.decodePixels(Jpeg.encodeRgb(w, h, rgb)).get
      val d = Jpeg.decodePixels(Jpeg.encodeProgressiveRgb(w, h, rgb)).get
      withClue(s"rgb ${w}x$h: ") { d._4.toSeq shouldBe c._4.toSeq }
    }
  }

  it should "match baseline under 4:2:0 subsampling and standard tables" in {
    // 4:2:0 makes the chroma real block grid smaller than the padded
    // grid (non-interleaved AC scans vs interleaved DC), and quality-85
    // tables zero out most high frequencies — long EOBn runs
    var seed = 4242L
    def nxt(): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % 256).toInt
    }
    val lq = Jpeg.scaledQuant(Jpeg.StdLumaQuant, 85)
    val cq = Jpeg.scaledQuant(Jpeg.StdChromaQuant, 85)
    for ((w, h) <- Seq(32 -> 32, 33 -> 17, 48 -> 40)) {
      // smooth gradient: heavy quantization leaves sparse coefficients
      val rgb = Array.tabulate[Byte](w * h * 3) { i =>
        val p = i / 3; ((p % w) * 3 + (p / w) * 2 + i % 3 * 40).toByte
      }
      val a = Jpeg.decodePixels(Jpeg.encodeRgb(w, h, rgb, lq, cq,
        subsample420 = true)).get
      val b = Jpeg.decodePixels(Jpeg.encodeProgressiveRgb(w, h, rgb, lq, cq,
        subsample420 = true)).get
      withClue(s"${w}x$h smooth: ") { b._4.toSeq shouldBe a._4.toSeq }
      val noisy = Array.fill[Byte](w * h * 3)(nxt().toByte)
      val c = Jpeg.decodePixels(Jpeg.encodeRgb(w, h, noisy, lq, cq,
        subsample420 = true)).get
      val d = Jpeg.decodePixels(Jpeg.encodeProgressiveRgb(w, h, noisy, lq, cq,
        subsample420 = true)).get
      withClue(s"${w}x$h noisy: ") { d._4.toSeq shouldBe c._4.toSeq }
    }
  }

  it should "drive multi-block EOBn runs on near-constant content" in {
    // a constant image leaves only DC: every AC scan is one scan-length
    // EOBn run, so the decoder's (1<<r)+bits(r) run arithmetic is live
    val w = 128; val h = 64
    val pix = Array.fill[Byte](w * h)(90.toByte)
    val enc = Jpeg.encodeProgressiveGray(w, h, pix)
    val dec = Jpeg.decodePixels(enc).get
    dec._4.toSeq shouldBe pix.toSeq
    // and it must compress far below one byte per pixel to prove the
    // runs actually collapsed (not per-block EOB0s)
    enc.length should be < (w * h / 8)
  }

  it should "refuse truncated progressive streams loudly" in {
    val rgb = Array.tabulate[Byte](24 * 24 * 3)(i => (i * 11 % 256).toByte)
    val good = Jpeg.encodeProgressiveRgb(24, 24, rgb)
    Jpeg.decodePixels(good) should not be None
    Jpeg.decodePixels(good.take(good.length - 5)) shouldBe None
    Jpeg.decodePixels(good.take(good.length / 2)) shouldBe None
    Jpeg.dimensions(good) shouldBe Some((24, 24, 3))
  }

  "dimensions" should "report SOF geometry without entropy decode" in {
    Jpeg.dimensions(Jpeg.encodeGray(320, 200, new Array[Byte](320 * 200))) shouldBe
      Some((320, 200, 1))
    Jpeg.dimensions(Jpeg.encodeRgb(64, 48, new Array[Byte](64 * 48 * 3),
      subsample420 = true)) shouldBe Some((64, 48, 3))
    Jpeg.dimensions("JFIF but not".getBytes("UTF-8")) shouldBe None
  }

  "Media integration" should "surface JPEG through HeaderDecoder, stats, and resize" in {
    val rgb = grayRgbBlocks(32, 32, b => (b * 31 + 2) % 256)
    val jpeg = Jpeg.encodeRgb(32, 32, rgb, subsample420 = true)
    val rec = Media.MediaRecord(5L, "image/jpeg", jpeg)
    val feats = Media.HeaderDecoder.decode(Iterator(rec)).next()
    feats.width shouldBe 32; feats.height shouldBe 32; feats.frames shouldBe 1
    val stats = Media.SampleStatsDecoder.decodeStats(Iterator(rec)).toSeq
    stats should have size 1
    stats.head.n_samples shouldBe 32L * 32 * 3
    // exact closed form: each of 16 blocks contributes 64 pixels × 3
    val vals = (0 until 16).map(b => (b * 31 + 2) % 256)
    stats.head.min_val shouldBe vals.min.toLong
    stats.head.max_val shouldBe vals.max.toLong
    stats.head.mean_val shouldBe vals.map(_ * 64L * 3).sum.toDouble / (32 * 32 * 3)
  }

  it should "resize decoded JPEG input to exact nearest-neighbor PNG output" in {
    // resizeImages is a Spark operator; exercise its per-record kernel via
    // the same decode→map→encode chain it runs: decode JPEG, halve, decode
    // the PNG it emits, and verify against the closed-form index map
    val rgb = grayRgbBlocks(32, 32, b => (b * 29 + 7) % 256)
    val jpeg = Jpeg.encodeRgb(32, 32, rgb, subsample420 = true)
    val (w, h, ch, pix) = Jpeg.decodePixels(jpeg).get
    (w, h, ch) shouldBe ((32, 32, 3))
    // nearest-neighbor halve: out(x,y) = src(2x, 2y)
    val out = Array.tabulate[Byte](16 * 16 * 3) { i =>
      val c = i % 3; val p = i / 3; val x = p % 16; val y = p / 16
      pix(((y * 2) * 32 + x * 2) * 3 + c)
    }
    val png = Media.pngBytesPixels(16, 16, j => out(j) & 0xff)
    Media.SampleStatsDecoder.pngPixels(png).map(_._4.toSeq) shouldBe Some(out.toSeq)
  }
}
