package graft

import graft.multimodal.Flac
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Pure-JVM FLAC codec: lossless round trips (the format's own
  * guarantee — no fixture trickery needed), every subframe type and
  * stereo mode, CRC refusal. No Spark needed. */
class FlacSpec extends AnyFlatSpec with Matchers {

  private def roundTrip(rate: Int, chans: Array[Array[Int]],
                        blockSize: Int = 4096,
                        mode: Flac.Mode.Value = Flac.Mode.Independent): Unit = {
    val enc = Flac.encode(rate, chans, blockSize, mode)
    val (gr, gc, got) = Flac.decode(enc).get
    gr shouldBe rate
    gc shouldBe chans.length
    for (c <- chans.indices)
      withClue(s"channel $c:") { got(c).toSeq shouldBe chans(c).toSeq }
  }

  "encode/decode" should "round-trip mono content across predictor shapes" in {
    // constant → order 0/constant; ramp → order-1 residuals collapse;
    // quadratic-ish → order 2; noise → verbatim fallback
    roundTrip(16000, Array(Array.fill(1000)(441)))
    roundTrip(16000, Array(Array.tabulate(1000)(i => i % 3000 - 1500)))
    roundTrip(8000, Array(Array.tabulate(1000)(i => (i * i / 50) % 4000 - 2000)))
    var seed = 7L
    val noise = Array.fill(1000) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % 65536 - 32768).toInt
    }
    roundTrip(44100, Array(noise))
  }

  it should "round-trip multi-frame streams with a short tail frame" in {
    val pcm = Array.tabulate(10000)(i => (i * 37) % 20000 - 10000)
    roundTrip(22050, Array(pcm), blockSize = 4096) // 2 full + 1808 tail
    roundTrip(22050, Array(pcm), blockSize = 256)  // 39 full + 16 tail
  }

  it should "round-trip all three stereo modes bit-exactly" in {
    val l = Array.tabulate(3000)(i => (i * 13) % 8000 - 4000)
    val r = Array.tabulate(3000)(i => (i * 13) % 8000 - 4000 + (i % 7) - 3)
    for (m <- Seq(Flac.Mode.Independent, Flac.Mode.MidSide, Flac.Mode.LeftSide))
      withClue(s"$m:") { roundTrip(48000, Array(l, r), mode = m) }
    // odd l+r sums force the mid/side LSB-carry path
    val odd = Array.tabulate(500)(i => if (i % 2 == 0) -3001 else 2998)
    val even = Array.tabulate(500)(_ => 1001)
    roundTrip(48000, Array(odd, even), mode = Flac.Mode.MidSide)
  }

  it should "use the 5-bit rice escape for 15-bit residuals and round-trip" in {
    // order-0 residuals ARE the values: magnitudes ~16000 → zigzag 15
    // bits → param 15 > 14 → escape with 16-bit raw coding (cheaper
    // than 16-bit verbatim only because order picking is by |sum|, so
    // the encoder still prefers order 0 here and escapes)
    val pcm = Array.tabulate(2000)(i => if (i % 2 == 0) 0 else 16000)
    val enc = Flac.encode(8000, Array(pcm), blockSize = 1024)
    Flac.decode(enc).get._3.head.toSeq shouldBe pcm.toSeq
  }

  it should "pick LPC for resonant content and round-trip it" in {
    // mid-frequency resonance s(i) ≈ 0.99·s(i-1) − 0.98·s(i-2) (poles
    // at ±60°, far from every fixed predictor's (0/1/2-step) zeros),
    // re-excited every 256 samples so it never decays to silence
    val n = 4096
    val s = new Array[Int](n)
    s(0) = 9000; s(1) = 8000
    for (i <- 2 until n) {
      var v = Math.round(0.99 * s(i - 1) - 0.98 * s(i - 2)).toInt
      if (i % 256 == 0) v += 7000
      s(i) = math.max(-32000, math.min(32000, v))
    }
    Flac.writeSubframeForTest(s, 16) shouldBe "lpc"
    // the whole stream (multi-frame, LPC subframes) must round-trip
    val enc = Flac.encode(16000, Array(s), blockSize = 1024)
    Flac.decode(enc).get._3.head.toSeq shouldBe s.toSeq
    // and LPC must genuinely compress the oscillation
    enc.length should be < (n * 2 / 3)
    // sanity of the other choices on their home turf
    Flac.writeSubframeForTest(Array.tabulate(512)(i => i % 1000), 16) shouldBe "fixed"
    var seed = 3L
    val noise = Array.fill(512) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % 65536 - 32768).toInt
    }
    Flac.writeSubframeForTest(noise, 16) shouldBe "verbatim"
  }

  it should "really compress smooth content" in {
    val pcm = Array.tabulate(40000)(i => i % 2000 - 1000) // ramps
    val enc = Flac.encode(16000, Array(pcm))
    enc.length should be < (40000 * 2 / 4) // ≥4× under 16-bit PCM
  }

  it should "refuse truncation and corruption loudly" in {
    val enc = Flac.encode(8000,
      Array(Array.tabulate(500)(i => (i * 91) % 10000 - 5000)))
    Flac.decode(enc).isDefined shouldBe true
    Flac.decode(enc.take(enc.length - 3)) shouldBe None
    Flac.decode(enc.take(10)) shouldBe None
    Flac.decode("not flac at all".getBytes("UTF-8")) shouldBe None
    // flip one entropy byte: the frame CRC-16 must catch it
    val bad = enc.clone()
    bad(enc.length - 40) = (bad(enc.length - 40) ^ 0x20).toByte
    Flac.decode(bad) shouldBe None
    // patch STREAMINFO bps to 24-bit: out of scope → None
    val deep = enc.clone()
    // bps-1 top bits live in byte 8+4+13 = byte 12 of STREAMINFO region
    deep(8 + 12) = (deep(8 + 12) | 0x01).toByte // 15 -> 17 (bps 18)
    Flac.decode(deep) shouldBe None
  }

  // ---- hand-assembled streams for the decoder-only branches ---------------

  /** Minimal MSB-first bit writer for hand-building test streams. */
  private class TW {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0; var n = 0
    def b(v: Long, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1).toInt; n += 1
        if (n == 8) { out.write(acc & 0xff); acc = 0; n = 0 }
        i -= 1
      }
    }
    def bytes: Array[Byte] = { if (n > 0) b(0, 8 - n); out.toByteArray }
  }

  private def streamInfo(blockSize: Int, rate: Int, total: Int): Array[Byte] = {
    val w = new TW
    w.b(blockSize, 16); w.b(blockSize, 16); w.b(0, 24); w.b(0, 24)
    w.b(rate, 20); w.b(0, 3); w.b(15, 5); w.b(total, 36)
    (0 until 16).foreach(_ => w.b(0, 8))
    val si = w.bytes
    "fLaC".getBytes("US-ASCII") ++ Array[Byte](0x80.toByte, 0, 0,
      si.length.toByte) ++ si
  }

  private def frameHeader(bs: Int): Array[Byte] = {
    val w = new TW
    w.b(0x3ffe, 14); w.b(0, 1); w.b(0, 1)
    w.b(0x7, 4); w.b(0, 4) // 16-bit blocksize field; rate from STREAMINFO
    w.b(0, 4)              // 1 channel
    w.b(0x4, 3); w.b(0, 1) // 16-bit samples
    w.b(0, 8)              // frame number 0
    w.b(bs - 1, 16)
    val h = w.bytes
    h :+ Flac.crc8(h, 0, h.length).toByte
  }

  it should "decode an LPC subframe (hand-built: coef=2, shift=1)" in {
    // s(i) = (2·s(i-1) >> 1) + res(i) = s(i-1) + res(i): a first-order
    // LPC whose expected output is a simple prefix sum
    val bs = 16
    val warm = 100
    val res = Array.tabulate(bs - 1)(i => (i % 5) - 2)
    val expected = res.scanLeft(warm)(_ + _)
    val w = new TW
    frameHeader(bs).foreach(x => w.b(x & 0xff, 8))
    w.b(0, 1); w.b(32, 6); w.b(0, 1) // LPC order 1, no wasted bits
    w.b(warm, 16)                    // warmup
    w.b(3, 4)                        // precision-1 = 3 → 4-bit coefs
    w.b(1, 5)                        // shift 1
    w.b(2, 4)                        // coef = +2
    w.b(0, 2); w.b(0, 4)             // rice-4, one partition
    w.b(3, 4)                        // rice param 3
    res.foreach { r =>
      val z = if (r >= 0) r << 1 else (-r << 1) - 1
      w.b(0, z >> 3); w.b(1, 1); w.b(z & 7, 3) // unary q then 3 low bits
    }
    val body = w.bytes
    val c16 = Flac.crc16(body, 0, body.length)
    val stream = streamInfo(bs, 8000, bs) ++ body ++
      Array[Byte]((c16 >> 8).toByte, c16.toByte)
    val (_, _, got) = Flac.decode(stream).get
    got.head.toSeq shouldBe expected.toSeq
  }

  it should "decode the 5-bit raw escape (hand-built fixed-0 subframe)" in {
    val bs = 16
    val res = Array.tabulate(bs)(i => (i * 4001) % 30000 - 15000)
    val raw = 16
    val w = new TW
    frameHeader(bs).foreach(x => w.b(x & 0xff, 8))
    w.b(0, 1); w.b(8, 6); w.b(0, 1) // fixed order 0, no wasted bits
    w.b(0, 2); w.b(0, 4)            // rice-4, one partition
    w.b(0xf, 4); w.b(raw, 5)        // ESCAPE: 16-bit raw residuals
    res.foreach(r => w.b(r.toLong & 0xffff, raw))
    val body = w.bytes
    val c16 = Flac.crc16(body, 0, body.length)
    val stream = streamInfo(bs, 8000, bs) ++ body ++
      Array[Byte]((c16 >> 8).toByte, c16.toByte)
    val (_, _, got) = Flac.decode(stream).get
    got.head.toSeq shouldBe res.toSeq // order 0: residuals ARE the samples
  }

  it should "decode wasted bits (hand-built constant subframe)" in {
    val bs = 16
    val w = new TW
    frameHeader(bs).foreach(x => w.b(x & 0xff, 8))
    w.b(0, 1); w.b(0, 6)       // constant subframe
    w.b(1, 1); w.b(1, 2)       // wasted flag, unary "01" → wasted = 2
    w.b(300, 14)               // value in bps - wasted = 14 bits
    val body = w.bytes
    val c16 = Flac.crc16(body, 0, body.length)
    val stream = streamInfo(bs, 8000, bs) ++ body ++
      Array[Byte]((c16 >> 8).toByte, c16.toByte)
    val (_, _, got) = Flac.decode(stream).get
    got.head.toSeq shouldBe Seq.fill(bs)(300 << 2)
  }
}
