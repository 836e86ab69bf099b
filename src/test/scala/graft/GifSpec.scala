package graft

import graft.multimodal.Gif
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Pure-JVM GIF codec: exact round trips through real LZW compression,
  * including dictionary width growth, the KwKwK self-referencing code,
  * the 4096-entry reset, sub-block spanning, and loud None for
  * truncation and out-of-scope (interlaced) streams. No Spark needed —
  * the codec is plain JVM code the media operators mapPartition over. */
class GifSpec extends AnyFlatSpec with Matchers {

  private val gray = Array.tabulate(256)(i => (i << 16) | (i << 8) | i)

  private def roundTrip(w: Int, h: Int, pal: Array[Int],
                        idx: Array[Byte]): Unit = {
    val bytes = Gif.encode(w, h, pal, idx)
    Gif.isGif(bytes) shouldBe true
    Gif.dimensions(bytes) shouldBe Some((w, h))
    val Some((dw, dh, rgb)) = Gif.decodePixels(bytes)
    dw shouldBe w; dh shouldBe h
    rgb.length shouldBe w * h * 3
    var j = 0
    while (j < idx.length) {
      val e = pal(idx(j) & 0xff)
      (rgb(j * 3) & 0xff) shouldBe ((e >> 16) & 0xff)
      (rgb(j * 3 + 1) & 0xff) shouldBe ((e >> 8) & 0xff)
      (rgb(j * 3 + 2) & 0xff) shouldBe (e & 0xff)
      j += 1
    }
  }

  "Gif" should "round-trip a single pixel" in {
    roundTrip(1, 1, gray, Array[Byte](42))
  }

  it should "round-trip constant runs (the KwKwK code path)" in {
    // long same-value runs force codes that reference the entry being
    // defined (the aaaa... pattern is the canonical KwKwK stream)
    roundTrip(16, 4, gray, Array.fill[Byte](64)(7))
  }

  it should "round-trip small palettes (3..12-bit code widths)" in {
    val pal4 = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    roundTrip(5, 3, pal4, Array.tabulate[Byte](15)(j => (j % 4).toByte))
    val pal2 = Array(0x000000, 0xffffff)
    roundTrip(9, 2, pal2, Array.tabulate[Byte](18)(j => (j % 2).toByte))
  }

  it should "round-trip the gate fixture closed form" in {
    val pal = Array.tabulate(256)(i =>
      (((i * 3 + 1) % 256) << 16) | (((i * 5 + 2) % 256) << 8) |
        ((i * 7 + 3) % 256))
    for (id <- 0L to 20L; n <- Seq(0L, 5L, 13L)) {
      val w = (3 + n % 14).toInt; val h = (1 + id % 9).toInt
      val run = (1 + id % 3).toInt
      val idx = Array.tabulate[Byte](w * h)(j =>
        ((id * 43 + (j / run).toLong * 17) % 256).toByte)
      roundTrip(w, h, pal, idx)
    }
  }

  it should "round-trip a large image crossing width bumps and the 4096 reset" in {
    // 300x300 LCG pixels build >4096 dictionary entries: the stream must
    // carry 9, 10, 11 and 12-bit codes plus at least one mid-stream clear
    var seed = 12345L
    val idx = Array.tabulate[Byte](300 * 300) { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % 256).toByte
    }
    roundTrip(300, 300, gray, idx)
    // and a highly-compressible one: dictionary entries grow long
    val runs = Array.tabulate[Byte](300 * 300)(j => ((j / 97) % 5).toByte)
    roundTrip(300, 300, gray, runs)
  }

  it should "refuse truncated and non-GIF payloads" in {
    val good = Gif.encode(10, 10, gray,
      Array.tabulate[Byte](100)(j => (j % 256).toByte))
    Gif.decodePixels(good).isDefined shouldBe true
    Gif.decodePixels(good.take(good.length - 30)) shouldBe None
    Gif.decodePixels(good.take(12)) shouldBe None
    Gif.decodePixels("GIF89a but not really".getBytes("US-ASCII")) shouldBe None
    Gif.decodePixels(Array[Byte](1, 2, 3)) shouldBe None
  }

  it should "decode interlaced images identically to sequential" in {
    // heights straddling the 4 interlace passes: h < 2 (pass 1 only),
    // h = 3 (passes 1/3/4), h = 5 (all but a second pass-1 row), big
    for ((w, h) <- Seq(10 -> 10, 4 -> 1, 3 -> 2, 5 -> 3, 7 -> 5, 6 -> 16)) {
      val idx = Array.tabulate[Byte](w * h)(j => ((j * 7 + 3) % 256).toByte)
      val seqOut = Gif.decodePixels(Gif.encode(w, h, gray, idx)).get
      val intOut = Gif.decodePixels(
        Gif.encodeFrames(w, h, gray, Seq(idx), interlaced = true)).get
      withClue(s"${w}x$h:") { intOut._3.toSeq shouldBe seqOut._3.toSeq }
    }
  }

  it should "apply the 4-pass row remap, not just accept the flag" in {
    // flip the interlace bit on SEQUENTIALLY-stored data: the decoder
    // must treat stored row k as raster row order(k) — a decoder that
    // ignores the flag would return the rows unmoved
    val w = 3; val h = 8
    val idx = Array.tabulate[Byte](w * h)(j => (j / w).toByte) // row number
    val good = Gif.encode(w, h, gray, idx)
    val flipped = good.clone()
    val idOff = 13 + 768
    flipped(idOff) shouldBe 0x2c.toByte
    flipped(idOff + 9) = (flipped(idOff + 9) | 0x40).toByte
    val got = Gif.decodePixels(flipped).get
    // h=8 schedule: pass1 row 0, pass2 row 4, pass3 rows 2,6, pass4 odd
    val order = Seq(0, 4, 2, 6, 1, 3, 5, 7)
    val rasterRowValue = Array.ofDim[Int](h)
    order.zipWithIndex.foreach { case (raster, stored) =>
      rasterRowValue(raster) = stored
    }
    val gotRows = (0 until h).map(r => got._3(r * w * 3) & 0xff)
    gotRows shouldBe (0 until h).map(rasterRowValue)
  }

  it should "round-trip interlaced animated frames" in {
    val w = 5; val h = 9
    val frames = (0 until 3).map(f =>
      Array.tabulate[Byte](w * h)(j => ((f * 41 + j * 13) % 256).toByte))
    val bytes = Gif.encodeFrames(w, h, gray, frames, interlaced = true)
    val (gw, gh, got) = Gif.decodeFrames(bytes).get
    gw shouldBe w; gh shouldBe h; got.size shouldBe 3
    for (f <- 0 until 3) {
      val expect = frames(f).map { b =>
        val rgb = gray(b & 0xff); Seq((rgb >> 16).toByte, (rgb >> 8).toByte, rgb.toByte)
      }.flatten.toSeq
      withClue(s"frame $f:") { got(f).toSeq shouldBe expect }
    }
  }

  it should "skip extension blocks and honor a local color table" in {
    val base = Gif.encode(3, 2, gray, Array[Byte](1, 2, 3, 4, 5, 6))
    // splice a GIF89a graphic-control extension before the image descriptor
    val idOff = 13 + 768
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = base.take(idOff) ++ ext ++ base.drop(idOff)
    val Some((w, h, rgb)) = Gif.decodePixels(spliced)
    (w, h) shouldBe ((3, 2))
    (rgb(0) & 0xff) shouldBe 1 // palette[1] = gray 1
    // local color table: rebuild the descriptor with LCT flag + a 2-entry
    // table that inverts the global mapping
    val pal2 = Array(0xffffff, 0x000000)
    val withLct = Gif.encode(2, 1, pal2, Array[Byte](0, 1))
    val Some((_, _, rgb2)) = Gif.decodePixels(withLct)
    (rgb2(0) & 0xff) shouldBe 255
    (rgb2(3) & 0xff) shouldBe 0
  }

  it should "round-trip animated multi-frame GIFs with per-frame LZW resets" in {
    val frames = (0 until 5).map(f =>
      Array.tabulate[Byte](7 * 4)(j => ((f * 23 + j * 17) % 256).toByte))
    val bytes = Gif.encodeFrames(7, 4, gray, frames)
    val Some((w, h, got)) = Gif.decodeFrames(bytes)
    (w, h) shouldBe ((7, 4))
    got.size shouldBe 5
    got.zip(frames).foreach { case (rgb, idx) =>
      idx.indices.foreach { j =>
        (rgb(j * 3) & 0xff) shouldBe (idx(j) & 0xff) // gray palette
      }
    }
    // decodePixels = first frame
    Gif.decodePixels(bytes).map(_._3.toSeq) shouldBe Some(got.head.toSeq)
    // a partial (non-full-screen) frame refuses: compositing semantics
    // are out of scope and a silently-wrong decode would poison stats
    val single = Gif.encode(7, 4, gray, frames.head)
    val idOff = 13 + 768
    val shrunk = single.clone()
    shrunk(idOff + 5) = 6 // width 6 != screen 7
    Gif.decodeFrames(shrunk) shouldBe None
  }

  it should "be detected by the header decoder with correct dimensions" in {
    val bytes = Gif.encode(17, 5, gray,
      Array.tabulate[Byte](85)(j => (j % 9).toByte))
    Gif.dimensions(bytes) shouldBe Some((17, 5))
  }
}
