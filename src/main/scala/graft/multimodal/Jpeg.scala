package graft.multimodal

/** Pure-JVM JPEG (ITU-T T.81) codec — encoder + decoder, no external
  * codec library.
  *
  * Closes the loudly-stubbed media family (COVERAGE.md "De-scoped"
  * note): the reference treats media as opaque bytes, but a multimodal
  * training pipeline at 100 TB needs real JPEG decode for quality
  * filtering and resize normalization. Scope is sequential DCT
  * (SOF0/SOF1) AND progressive DCT (SOF2): 8-bit samples, Huffman
  * entropy coding, 1 or 3 components, sampling factors 1–2
  * (4:4:4 / 4:2:2 / 4:2:0), restart markers; progressive covers
  * spectral selection, successive approximation (DC and AC refinement
  * scans), and EOBn end-of-band runs, with a matching progressive
  * ENCODER (per-scan optimal Huffman tables per Annex K.2) so round
  * trips drive every decode path. Arithmetic coding, 12-bit, and
  * hierarchical modes return None — same loud-drop convention as the
  * PNG/BMP/WAV decoders; a silent fake would poison quality filters.
  *
  * Determinism: all real arithmetic is IEEE double with a fixed
  * operation order (separable DCT over a shared cosine table), so every
  * executor — and any engine replaying the same formulas — produces
  * identical bytes and identical decoded pixels. The m6 gate exploits a
  * sharper property: with unit quantization tables, block-CONSTANT
  * images round-trip bit-exactly (the DC coefficient 8·(v−128) is an
  * exact integer, every AC folds to < 1e-10 and quantizes to zero), and
  * gray-valued RGB pixels make the YCbCr transform exact (Y = v,
  * Cb = Cr = 128 after rounding), so a DuckDB oracle can predict the
  * decoded samples in closed form even though JPEG is lossy in general.
  *
  * All tables here (zigzag order, Annex K quantization and Huffman
  * tables, JFIF YCbCr coefficients) are from the public T.81 / JFIF
  * specs.
  */
object Jpeg {

  // ---- shared tables ------------------------------------------------------

  /** Zigzag position k → natural (row-major) coefficient index (T.81
    * Figure 5). */
  private[multimodal] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16), the shared FDCT/IDCT basis. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16)
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** All-ones quantization table: lossless for block-constant images and
    * near-lossless (|err| ≤ a few counts) for arbitrary ones. */
  val UnitQuant: Array[Int] = Array.fill(64)(1)

  /** Annex K Table K.1 — example luminance quantization (natural order). */
  val StdLumaQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K Table K.2 — example chrominance quantization. */
  val StdChromaQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** The public IJG quality scaling of a base table: scale = 5000/q below
    * 50 else 200−2q, entries clamped to [1, 255]. */
  def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality in [1,100], got $quality")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(v => math.min(255, math.max(1, (v * scale + 50) / 100)))
  }

  // Annex K Huffman tables: (bits(1..16), values). `bits` counts codes of
  // each length; values are in canonical order.
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray
  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical code assignment: value → (code, length). */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        table(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    table
  }

  private lazy val DcLumaEnc = buildEncodeTable(DcLumaBits, DcLumaVals)
  private lazy val DcChromaEnc = buildEncodeTable(DcChromaBits, DcChromaVals)
  private lazy val AcLumaEnc = buildEncodeTable(AcLumaBits, AcLumaVals)
  private lazy val AcChromaEnc = buildEncodeTable(AcChromaBits, AcChromaVals)

  // ---- DCT ----------------------------------------------------------------

  /** Forward 2-D DCT-II with JPEG normalization, separable (rows then
    * columns); `in` is the level-shifted block in natural order. */
  private def fdct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // 1-D over x for each row y
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += in(y * 8 + x) * Cos(x)(u); x += 1 }
        tmp(y * 8 + u) = s * (if (u == 0) InvSqrt2 else 1.0) / 2.0
        u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) { // 1-D over y for each column u
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * Cos(yy)(v); yy += 1 }
        out(v * 8 + u) = s * (if (v == 0) InvSqrt2 else 1.0) / 2.0
        u += 1
      }
      v += 1
    }
  }

  /** Inverse 2-D DCT (same normalization), separable. */
  private def idct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // 1-D over u for each coefficient row v
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          s += (if (u == 0) InvSqrt2 else 1.0) * in(v * 8 + u) * Cos(x)(u)
          u += 1
        }
        tmp(v * 8 + x) = s / 2.0
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) {
          s += (if (vv == 0) InvSqrt2 else 1.0) * tmp(vv * 8 + x) * Cos(y)(vv)
          vv += 1
        }
        out(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
  }

  // ---- encoder ------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the current byte with 1-bits (spec: fill bits). */
    def align(): Unit = if (nbits > 0) put(0xff, 8 - nbits)
  }

  /** Magnitude category (SSSS): smallest t with |v| < 2^t. */
  private def category(v: Int): Int = {
    var t = 0
    var a = math.abs(v)
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  private def writeU16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }

  private def marker(o: java.io.ByteArrayOutputStream, m: Int): Unit = {
    o.write(0xff); o.write(m)
  }

  /** One component plane: samples at `w`×`h`, stored row-major. */
  private final case class Plane(w: Int, h: Int, samples: Array[Int]) {
    /** Edge-replicated sample fetch — block padding per the usual
      * encoder practice (keeps padded blocks smooth). */
    def at(x: Int, y: Int): Int =
      samples(math.min(h - 1, math.max(0, y)) * w + math.min(w - 1, math.max(0, x)))
  }

  /** Encode-side per-component config. */
  private final case class EncComp(id: Int, hSamp: Int, vSamp: Int,
                                   quantId: Int, dcTable: Array[(Int, Int)],
                                   acTable: Array[(Int, Int)], plane: Plane)

  /** Encode a grayscale (1-component) baseline JPEG. `pixels` is
    * row-major, one byte per pixel. */
  def encodeGray(width: Int, height: Int, pixels: Array[Byte],
                 quant: Array[Int] = UnitQuant,
                 restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == width * height,
      s"expected ${width * height} gray pixels, got ${pixels.length}")
    val plane = Plane(width, height,
      Array.tabulate(width * height)(i => pixels(i) & 0xff))
    val comps = Array(EncComp(1, 1, 1, 0, DcLumaEnc, AcLumaEnc, plane))
    encodeBaseline(width, height, comps, Array(quant), restartInterval)
  }

  /** Encode an RGB (3-component YCbCr) baseline JPEG; `rgb` is row-major
    * interleaved RGB bytes. `subsample420` selects 2×2 luma / 1×1 chroma
    * sampling (the common web layout) vs 4:4:4; chroma downsampling is
    * the exact integer mean `(a+b+c+d+2)/4`. */
  def encodeRgb(width: Int, height: Int, rgb: Array[Byte],
                lumaQuant: Array[Int] = UnitQuant,
                chromaQuant: Array[Int] = UnitQuant,
                subsample420: Boolean = false,
                restartInterval: Int = 0): Array[Byte] =
    encodeBaseline(width, height,
      rgbEncComps(width, height, rgb, subsample420),
      Array(lumaQuant, chromaQuant), restartInterval)

  /** RGB → YCbCr component planes (shared by the baseline and
    * progressive encoders). */
  private def rgbEncComps(width: Int, height: Int, rgb: Array[Byte],
                          subsample420: Boolean): Array[EncComp] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == width * height * 3,
      s"expected ${width * height * 3} rgb bytes, got ${rgb.length}")
    val n = width * height
    val ys = new Array[Int](n); val cb = new Array[Int](n); val cr = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = rgb(i * 3) & 0xff; val g = rgb(i * 3 + 1) & 0xff; val b = rgb(i * 3 + 2) & 0xff
      // JFIF YCbCr, rounded and clamped to [0,255]
      ys(i) = clamp8(Math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt)
      cb(i) = clamp8(Math.round(128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b).toInt)
      cr(i) = clamp8(Math.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b).toInt)
      i += 1
    }
    val yPlane = Plane(width, height, ys)
    val (cbP, crP) =
      if (!subsample420) (Plane(width, height, cb), Plane(width, height, cr))
      else {
        val cw = (width + 1) / 2; val chh = (height + 1) / 2
        def down(src: Array[Int]): Plane = {
          val out = new Array[Int](cw * chh)
          var y = 0
          while (y < chh) {
            var x = 0
            while (x < cw) {
              val x0 = x * 2; val y0 = y * 2
              val x1 = math.min(width - 1, x0 + 1); val y1 = math.min(height - 1, y0 + 1)
              out(y * cw + x) = (src(y0 * width + x0) + src(y0 * width + x1) +
                src(y1 * width + x0) + src(y1 * width + x1) + 2) / 4
              x += 1
            }
            y += 1
          }
          Plane(cw, chh, out)
        }
        (down(cb), down(cr))
      }
    val (hy, vy) = if (subsample420) (2, 2) else (1, 1)
    Array(
      EncComp(1, hy, vy, 0, DcLumaEnc, AcLumaEnc, yPlane),
      EncComp(2, 1, 1, 1, DcChromaEnc, AcChromaEnc, cbP),
      EncComp(3, 1, 1, 1, DcChromaEnc, AcChromaEnc, crP))
  }

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def encodeBaseline(width: Int, height: Int, comps: Array[EncComp],
                             quants: Array[Array[Int]],
                             restartInterval: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    marker(out, 0xd8) // SOI
    // APP0 / JFIF 1.1, no thumbnail
    marker(out, 0xe0); writeU16(out, 16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0) // version 1.1, no density units
    writeU16(out, 1); writeU16(out, 1); out.write(0); out.write(0)
    // DQT — one segment per table, entries in zigzag order
    quants.zipWithIndex.foreach { case (q, id) =>
      marker(out, 0xdb); writeU16(out, 67); out.write(id)
      var k = 0
      while (k < 64) { out.write(q(ZigZag(k)) & 0xff); k += 1 }
    }
    // SOF0
    marker(out, 0xc0); writeU16(out, 8 + 3 * comps.length)
    out.write(8); writeU16(out, height); writeU16(out, width)
    out.write(comps.length)
    comps.foreach { c =>
      out.write(c.id); out.write((c.hSamp << 4) | c.vSamp); out.write(c.quantId)
    }
    // DHT — the four standard tables (only the ones referenced matter,
    // but emitting luma+chroma pairs keeps the header uniform)
    def dht(clazz: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(out, 0xc4); writeU16(out, 19 + vals.length)
      out.write((clazz << 4) | id)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, 0, DcLumaBits, DcLumaVals)
    dht(1, 0, AcLumaBits, AcLumaVals)
    if (comps.length > 1) {
      dht(0, 1, DcChromaBits, DcChromaVals)
      dht(1, 1, AcChromaBits, AcChromaVals)
    }
    if (restartInterval > 0) { marker(out, 0xdd); writeU16(out, 4); writeU16(out, restartInterval) }
    // SOS
    marker(out, 0xda); writeU16(out, 6 + 2 * comps.length)
    out.write(comps.length)
    comps.zipWithIndex.foreach { case (c, i) =>
      val tid = if (i == 0) 0 else 1
      out.write(c.id); out.write((tid << 4) | tid)
    }
    out.write(0); out.write(63); out.write(0) // Ss, Se, Ah/Al
    // entropy-coded data
    val hMax = comps.map(_.hSamp).max; val vMax = comps.map(_.vSamp).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val bw = new BitWriter(out)
    val dcPred = new Array[Int](comps.length)
    val shifted = new Array[Double](64); val coefs = new Array[Double](64)
    val quantized = new Array[Int](64)
    var mcu = 0
    var rstCount = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.align()
          marker(out, 0xd0 + (rstCount % 8))
          rstCount += 1
          java.util.Arrays.fill(dcPred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = quants(c.quantId)
          var by = 0
          while (by < c.vSamp) {
            var bx = 0
            while (bx < c.hSamp) {
              val px0 = (mx * c.hSamp + bx) * 8
              val py0 = (my * c.vSamp + by) * 8
              var k = 0
              while (k < 64) {
                shifted(k) = c.plane.at(px0 + k % 8, py0 + k / 8) - 128.0
                k += 1
              }
              fdct(shifted, coefs)
              k = 0
              while (k < 64) {
                quantized(k) = Math.round(coefs(k) / q(k)).toInt
                k += 1
              }
              // DC: category + diff bits
              val diff = quantized(0) - dcPred(ci)
              dcPred(ci) = quantized(0)
              val dcCat = category(diff)
              val (dcCode, dcLen) = c.dcTable(dcCat)
              bw.put(dcCode, dcLen)
              if (dcCat > 0) {
                val bits = if (diff >= 0) diff else diff + (1 << dcCat) - 1
                bw.put(bits, dcCat)
              }
              // AC: run/size with ZRL + EOB
              var run = 0
              var zz = 1
              while (zz < 64) {
                val v = quantized(ZigZag(zz))
                if (v == 0) run += 1
                else {
                  while (run >= 16) {
                    val (zc, zl) = c.acTable(0xf0); bw.put(zc, zl); run -= 16
                  }
                  val cat = category(v)
                  val (code, len) = c.acTable((run << 4) | cat)
                  bw.put(code, len)
                  val bits = if (v >= 0) v else v + (1 << cat) - 1
                  bw.put(bits, cat)
                  run = 0
                }
                zz += 1
              }
              if (run > 0) { val (ec, el) = c.acTable(0x00); bw.put(ec, el) }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.align()
    marker(out, 0xd9) // EOI
    out.toByteArray
  }

  // ---- progressive encoder -------------------------------------------------

  /** Annex K.2 optimal Huffman code-length derivation (the classic
    * libjpeg shape): pairwise merge of the two least-frequent symbols
    * with chained length increments, 16-bit limiting per K.3, and a
    * reserved 257th pseudo-symbol claiming the all-ones code so no real
    * symbol receives it. Returns (bits — count of codes per length 1..16
    * at index len-1, vals — symbols in canonical order). */
  private def genOptimalTable(freqIn: Array[Int]): (Array[Int], Array[Int]) = {
    val freq = new Array[Long](257)
    var i = 0
    while (i < 256) { freq(i) = freqIn(i).toLong; i += 1 }
    freq(256) = 1
    val codesize = new Array[Int](257)
    val others = Array.fill(257)(-1)
    var merging = true
    while (merging) {
      var c1 = -1; var v = Long.MaxValue
      i = 0
      while (i <= 256) { if (freq(i) > 0 && freq(i) <= v) { v = freq(i); c1 = i }; i += 1 }
      var c2 = -1; v = Long.MaxValue
      i = 0
      while (i <= 256) {
        if (freq(i) > 0 && freq(i) <= v && i != c1) { v = freq(i); c2 = i }
        i += 1
      }
      if (c2 < 0) merging = false
      else {
        freq(c1) += freq(c2); freq(c2) = 0
        codesize(c1) += 1
        var t = c1
        while (others(t) >= 0) { t = others(t); codesize(t) += 1 }
        others(t) = c2
        codesize(c2) += 1
        t = c2
        while (others(t) >= 0) { t = others(t); codesize(t) += 1 }
      }
    }
    val counts = new Array[Int](33)
    i = 0
    while (i <= 256) {
      if (codesize(i) > 0) {
        if (codesize(i) > 32) fail()
        counts(codesize(i)) += 1
      }
      i += 1
    }
    var l = 32
    while (l > 16) { // K.3: push over-long codes up into shorter slots
      while (counts(l) > 0) {
        var j = l - 2
        while (counts(j) == 0) j -= 1
        counts(l) -= 2; counts(l - 1) += 1
        counts(j + 1) += 2; counts(j) -= 1
      }
      l -= 1
    }
    while (counts(l) == 0) l -= 1
    counts(l) -= 1 // drop the reserved all-ones code
    val bits = Array.tabulate(16)(k => counts(k + 1))
    val vals = (0 until 256).filter(codesize(_) > 0)
      .sortBy(s => (codesize(s), s)).toArray
    (bits, vals)
  }

  /** Where a progressive scan's symbols and raw bits go: a counting pass
    * first (to build per-scan optimal tables), then the emitting pass. */
  private trait ProgSink {
    def sym(slot: Int, s: Int): Unit
    def bitsOut(v: Int, n: Int): Unit
  }

  /** One progressive scan over the quantized blocks — the exact dual of
    * the decoder's [[decodeProgScan]]: DC first/refine (interleaved MCU
    * order when several components share the scan), AC first with EOBn
    * end-of-band runs, AC successive-approximation refinement with
    * buffered correction bits (T.81 G.1.2.3 / figure G.7 flow). Runs
    * identically for the counting and emitting sinks. */
  private def runProgScan(width: Int, height: Int, comps: Array[EncComp],
                          blocks: Array[Array[Array[Int]]], bwPad: Array[Int],
                          mcusX: Int, mcusY: Int, hMax: Int, vMax: Int,
                          sel: Array[Int], ss: Int, se: Int, ah: Int, al: Int,
                          sink: ProgSink): Unit = {
    val dcPred = new Array[Int](comps.length)
    var eobrun = 0
    val beBits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def slotOf(ci: Int): Int = if (ci == 0) 0 else 1
    def flushEob(slot: Int): Unit = if (eobrun > 0) {
      var n = 0
      while ((eobrun >> (n + 1)) != 0) n += 1
      sink.sym(slot, n << 4)
      if (n > 0) sink.bitsOut(eobrun - (1 << n), n)
      beBits.foreach(sink.bitsOut(_, 1)); beBits.clear()
      eobrun = 0
    }
    def realGrid(ci: Int): (Int, Int) = {
      val c = comps(ci)
      val cw = (width * c.hSamp + hMax - 1) / hMax
      val ch = (height * c.vSamp + vMax - 1) / vMax
      ((cw + 7) / 8, (ch + 7) / 8)
    }
    def dcFirst(ci: Int, blk: Array[Int]): Unit = {
      val v = blk(0) >> al // arithmetic shift: the DC point transform
      val diff = v - dcPred(ci); dcPred(ci) = v
      val cat = category(diff)
      sink.sym(slotOf(ci), cat)
      if (cat > 0)
        sink.bitsOut(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
    }
    def dcRefine(blk: Array[Int]): Unit = sink.bitsOut((blk(0) >> al) & 1, 1)
    def acFirst(ci: Int, blk: Array[Int]): Unit = {
      val slot = slotOf(ci)
      var k = ss; var run = 0
      while (k <= se) {
        val v = blk(ZigZag(k))
        val t = if (v >= 0) v >> al else -((-v) >> al) // AC point transform
        if (t == 0) run += 1
        else {
          flushEob(slot)
          while (run > 15) { sink.sym(slot, 0xf0); run -= 16 }
          val cat = category(t)
          sink.sym(slot, (run << 4) | cat)
          sink.bitsOut(if (t >= 0) t else t + (1 << cat) - 1, cat)
          run = 0
        }
        k += 1
      }
      if (run > 0) { eobrun += 1; if (eobrun == 0x7fff) flushEob(slot) }
    }
    def acRefine(ci: Int, blk: Array[Int]): Unit = {
      val slot = slotOf(ci)
      val ts = new Array[Int](se + 1)
      var eobPos = ss - 1
      var k = ss
      while (k <= se) {
        val v = blk(ZigZag(k))
        val t = (if (v < 0) -v else v) >> al
        ts(k) = t
        if (t == 1) eobPos = k // newly-significant coefficients only
        k += 1
      }
      val brBits = scala.collection.mutable.ArrayBuffer.empty[Int]
      var r = 0
      k = ss
      while (k <= se) {
        val t = ts(k)
        if (t == 0) r += 1
        else {
          // ZRLs only when another new coefficient still follows —
          // otherwise the trailing run folds into the EOB
          while (r > 15 && k <= eobPos) {
            flushEob(slot)
            sink.sym(slot, 0xf0); r -= 16
            brBits.foreach(sink.bitsOut(_, 1)); brBits.clear()
          }
          if (t > 1) brBits += (t & 1) // old coefficient: correction bit
          else { // newly significant: run/1 + sign, then buffered bits
            flushEob(slot)
            sink.sym(slot, (r << 4) | 1)
            sink.bitsOut(if (blk(ZigZag(k)) < 0) 0 else 1, 1)
            brBits.foreach(sink.bitsOut(_, 1)); brBits.clear()
            r = 0
          }
        }
        k += 1
      }
      if (r > 0 || brBits.nonEmpty) { // block ends in an EOB
        eobrun += 1
        beBits ++= brBits
        if (eobrun == 0x7fff || beBits.length > 900) flushEob(slot)
      }
    }

    if (ss == 0) {
      if (sel.length > 1) { // interleaved MCU order over the padded grid
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            var i = 0
            while (i < sel.length) {
              val ci = sel(i); val c = comps(ci)
              var by = 0
              while (by < c.vSamp) {
                var bx = 0
                while (bx < c.hSamp) {
                  val blk = blocks(ci)(
                    (my * c.vSamp + by) * bwPad(ci) + mx * c.hSamp + bx)
                  if (ah == 0) dcFirst(ci, blk) else dcRefine(blk)
                  bx += 1
                }
                by += 1
              }
              i += 1
            }
            mx += 1
          }
          my += 1
        }
      } else {
        val ci = sel(0)
        val (w2, h2) = realGrid(ci)
        var by = 0
        while (by < h2) {
          var bx = 0
          while (bx < w2) {
            val blk = blocks(ci)(by * bwPad(ci) + bx)
            if (ah == 0) dcFirst(ci, blk) else dcRefine(blk)
            bx += 1
          }
          by += 1
        }
      }
    } else {
      val ci = sel(0)
      val (w2, h2) = realGrid(ci)
      var by = 0
      while (by < h2) {
        var bx = 0
        while (bx < w2) {
          val blk = blocks(ci)(by * bwPad(ci) + bx)
          if (ah == 0) acFirst(ci, blk) else acRefine(ci, blk)
          bx += 1
        }
        by += 1
      }
      flushEob(slotOf(ci)) // a scan never leaves an open end-of-band run
    }
  }

  /** Encode a grayscale progressive (SOF2) JPEG with the full scan
    * script: DC first at Al=1 → AC bands 1-5 and 6-63 at Al=1 → DC
    * refinement → AC refinements. Same pixel semantics as
    * [[encodeGray]] — identical quantized coefficients, different wire
    * order — so both decode to identical pixels. */
  def encodeProgressiveGray(width: Int, height: Int, pixels: Array[Byte],
                            quant: Array[Int] = UnitQuant): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == width * height,
      s"expected ${width * height} gray pixels, got ${pixels.length}")
    val plane = Plane(width, height,
      Array.tabulate(width * height)(i => pixels(i) & 0xff))
    encodeProgressiveImpl(width, height,
      Array(EncComp(1, 1, 1, 0, DcLumaEnc, AcLumaEnc, plane)), Array(quant))
  }

  /** Encode an RGB (YCbCr) progressive (SOF2) JPEG — the color and
    * subsampling semantics of [[encodeRgb]] with the progressive scan
    * script of [[encodeProgressiveGray]]. */
  def encodeProgressiveRgb(width: Int, height: Int, rgb: Array[Byte],
                           lumaQuant: Array[Int] = UnitQuant,
                           chromaQuant: Array[Int] = UnitQuant,
                           subsample420: Boolean = false): Array[Byte] =
    encodeProgressiveImpl(width, height,
      rgbEncComps(width, height, rgb, subsample420),
      Array(lumaQuant, chromaQuant))

  private def encodeProgressiveImpl(width: Int, height: Int,
                                    comps: Array[EncComp],
                                    quants: Array[Array[Int]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    marker(out, 0xd8)
    marker(out, 0xe0); writeU16(out, 16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0)
    writeU16(out, 1); writeU16(out, 1); out.write(0); out.write(0)
    quants.zipWithIndex.foreach { case (q, id) =>
      marker(out, 0xdb); writeU16(out, 67); out.write(id)
      var k = 0
      while (k < 64) { out.write(q(ZigZag(k)) & 0xff); k += 1 }
    }
    marker(out, 0xc2) // SOF2
    writeU16(out, 8 + 3 * comps.length)
    out.write(8); writeU16(out, height); writeU16(out, width)
    out.write(comps.length)
    comps.foreach { c =>
      out.write(c.id); out.write((c.hSamp << 4) | c.vSamp); out.write(c.quantId)
    }
    val hMax = comps.map(_.hSamp).max; val vMax = comps.map(_.vSamp).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val bwPad = comps.map(c => mcusX * c.hSamp)
    // quantize every block up front (the scans revisit them repeatedly)
    val shifted = new Array[Double](64); val dct = new Array[Double](64)
    val blocks: Array[Array[Array[Int]]] = comps.zipWithIndex.map { case (c, ci) =>
      val q = quants(c.quantId)
      val bw = bwPad(ci); val bh = mcusY * c.vSamp
      Array.tabulate(bw * bh) { bi =>
        val bx = bi % bw; val by = bi / bw
        var k = 0
        while (k < 64) {
          shifted(k) = c.plane.at(bx * 8 + k % 8, by * 8 + k / 8) - 128.0
          k += 1
        }
        fdct(shifted, dct)
        Array.tabulate(64)(k2 => Math.round(dct(k2) / q(k2)).toInt)
      }
    }
    val all = comps.indices.toArray
    val script: Seq[(Array[Int], Int, Int, Int, Int)] =
      Seq((all, 0, 0, 0, 1)) ++
        comps.indices.flatMap(ci =>
          Seq((Array(ci), 1, 5, 0, 1), (Array(ci), 6, 63, 0, 1))) ++
        Seq((all, 0, 0, 1, 0)) ++
        comps.indices.flatMap(ci =>
          Seq((Array(ci), 1, 5, 1, 0), (Array(ci), 6, 63, 1, 0)))
    def slotOf(ci: Int): Int = if (ci == 0) 0 else 1
    script.foreach { case (sel, ss, se, ah, al) =>
      val isDcRefine = ss == 0 && ah > 0
      var encTables: Array[Array[(Int, Int)]] = null
      if (!isDcRefine) { // counting pass → per-scan optimal tables + DHT
        val freqs = Array.fill(2)(new Array[Int](256))
        runProgScan(width, height, comps, blocks, bwPad, mcusX, mcusY,
          hMax, vMax, sel, ss, se, ah, al, new ProgSink {
            def sym(slot: Int, s: Int): Unit = freqs(slot)(s) += 1
            def bitsOut(v: Int, n: Int): Unit = ()
          })
        encTables = Array.ofDim[Array[(Int, Int)]](2)
        val clazz = if (ss == 0) 0 else 1
        var slot = 0
        while (slot < 2) {
          if (freqs(slot).exists(_ > 0)) {
            val (bits, vals) = genOptimalTable(freqs(slot))
            marker(out, 0xc4); writeU16(out, 19 + vals.length)
            out.write((clazz << 4) | slot)
            bits.foreach(out.write); vals.foreach(out.write)
            encTables(slot) = buildEncodeTable(bits, vals)
          }
          slot += 1
        }
      }
      marker(out, 0xda); writeU16(out, 6 + 2 * sel.length)
      out.write(sel.length)
      sel.foreach { ci =>
        val slot = slotOf(ci)
        out.write(comps(ci).id)
        out.write(if (ss == 0) (if (ah == 0) slot << 4 else 0) else slot)
      }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
      val bw = new BitWriter(out)
      val tables = encTables
      runProgScan(width, height, comps, blocks, bwPad, mcusX, mcusY,
        hMax, vMax, sel, ss, se, ah, al, new ProgSink {
          def sym(slot: Int, s: Int): Unit = {
            val e = tables(slot)(s)
            if (e == null) fail()
            bw.put(e._1, e._2)
          }
          def bitsOut(v: Int, n: Int): Unit = bw.put(v, n)
        })
      bw.align()
    }
    marker(out, 0xd9)
    out.toByteArray
  }

  // ---- decoder ------------------------------------------------------------

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  /** Canonical decode table per T.81 F.2.2.3: mincode/maxcode/valptr per
    * code length. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) maxCode(l) = -1
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(idx: Int): Int = if (idx < vals.length) vals(idx) else fail()
  }

  /** Entropy-segment bit reader with 0xFF00 unstuffing; stops (fails) at
    * any non-RST marker inside coefficient data. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) fail()
        var byte = b(pos) & 0xff; pos += 1
        if (byte == 0xff) {
          if (pos >= b.length) fail()
          val next = b(pos) & 0xff
          if (next == 0x00) pos += 1 // stuffed 0xFF data byte
          else fail() // a real marker mid-block is malformed input
          byte = 0xff
        }
        acc = byte; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.value(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      fail()
    }
    /** Drop partial bits and consume an expected RSTn marker. */
    def restart(n: Int): Unit = {
      nbits = 0
      if (pos + 2 > b.length) fail()
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 + n)) fail()
      pos += 2
    }
  }

  /** EXTEND (T.81 F.2.2.1): map `v` of category `t` back to its signed
    * value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class DecComp(id: Int, hSamp: Int, vSamp: Int, quantId: Int,
                                   var dcId: Int = 0, var acId: Int = 0)

  /** (width, height, components) from the SOFn frame header, or None.
    * Cheap header-only scan — no entropy decode; reports progressive and
    * extended frames too (their geometry is trustworthy even though
    * [[decodePixels]] declines to decode non-baseline payloads). */
  def dimensions(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var o = 2L
    while (o + 4 <= b.length) {
      val oi = o.toInt
      if ((b(oi) & 0xff) != 0xff) return None
      val m = b(oi + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9)) { o += 2 } // standalone
      else {
        val len = ((b(oi + 2) & 0xff) << 8) | (b(oi + 3) & 0xff)
        if (len < 2 || o + 2 + len > b.length) return None
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (len < 8) return None
          val h = ((b(oi + 5) & 0xff) << 8) | (b(oi + 6) & 0xff)
          val w = ((b(oi + 7) & 0xff) << 8) | (b(oi + 8) & 0xff)
          val nc = b(oi + 9) & 0xff
          return if (w > 0 && h > 0 && nc > 0) Some((w, h, nc)) else None
        }
        if (m == 0xda) return None // hit scan data with no SOF
        o += 2 + len
      }
    }
    None
  }

  /** Full baseline decode: (width, height, channels, pixels) with pixels
    * row-major — interleaved RGB for 3-component images, single bytes
    * for grayscale. None for anything that is not a well-formed
    * sequential (SOF0/SOF1) or progressive (SOF2) Huffman JPEG this
    * decoder fully understands (arithmetic, 12-bit, >2 sampling
    * factors, truncation, stray markers): loud-drop, never a partial
    * decode. */
  def decodePixels(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try decodeOrThrow(b) catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException => None
    }

  private def decodeOrThrow(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    val quants = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[DecComp] = null
    var width = 0; var height = 0
    var restartInterval = 0
    // progressive (SOF2) state: per-component coefficient planes filled
    // across scans, reconstructed at EOI
    var progressive = false
    var sawScan = false
    var coefPlanes: Array[Array[Int]] = null // per comp: padded blocks × 64
    var bwPad: Array[Int] = null             // padded block-grid width
    var mcusX = 0; var mcusY = 0; var hMax = 0; var vMax = 0
    var pos = 2
    def u8(): Int = { if (pos >= bytes.length) fail(); val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val hi = u8(); (hi << 8) | u8() }

    while (true) {
      if (u8() != 0xff) fail()
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes before a marker are legal
      m match {
        case 0xd9 => // EOI: progressive images reconstruct here
          if (!progressive || !sawScan) return None
          return reconstructProgressive(width, height, comps, quants,
            coefPlanes, bwPad, mcusX, mcusY)
        case 0xdb => // DQT
          val end = { val len = u16(); pos + len - 2 }
          while (pos < end) {
            val pq = u8()
            if ((pq >> 4) != 0) return None // 16-bit tables: not baseline
            val q = new Array[Int](64)
            var k = 0
            while (k < 64) { q(ZigZag(k)) = u8(); k += 1 }
            quants(pq & 3) = q
          }
          if (pos != end) fail()
        case 0xc4 => // DHT
          val end = { val len = u16(); pos + len - 2 }
          while (pos < end) {
            val tc = u8()
            val bits = Array.fill(16)(u8())
            val total = bits.sum
            if (total > 256) fail()
            val vals = Array.fill(total)(u8())
            val t = new HuffTable(bits, vals)
            if ((tc >> 4) == 0) dcTables(tc & 3) = t else acTables(tc & 3) = t
          }
          if (pos != end) fail()
        case 0xdd => // DRI
          if (u16() != 4) fail()
          restartInterval = u16()
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/SOF1 sequential, SOF2 progressive
          progressive = m == 0xc2
          val end = { val len = u16(); pos + len - 2 }
          if (u8() != 8) return None // 12-bit: out of scope
          height = u16(); width = u16()
          val nc = u8()
          if (nc < 1 || nc > 3 || width <= 0 || height <= 0) return None
          comps = Array.fill(nc) {
            val id = u8(); val hv = u8(); val quantId = u8()
            val c = DecComp(id, hv >> 4, hv & 0xf, quantId)
            if (c.hSamp < 1 || c.hSamp > 2 || c.vSamp < 1 || c.vSamp > 2) return None
            c
          }
          if (pos != end) fail()
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // lossless / arithmetic / hierarchical: out of scope
        case 0xda => // SOS — baseline: single scan; progressive: one of many
          if (comps == null) fail()
          val end = { val len = u16(); pos + len - 2 }
          val ns = u8()
          if (!progressive) {
            if (ns != comps.length) return None // non-interleaved: out of scope
            var i = 0
            while (i < ns) {
              val id = u8(); val tt = u8()
              val c = comps.find(_.id == id).getOrElse(fail())
              c.dcId = tt >> 4; c.acId = tt & 0xf
              i += 1
            }
            if (u8() != 0 || u8() != 63) return None // spectral selection
            u8() // Ah/Al
            if (pos != end) fail()
            return decodeScan(bytes, pos, width, height, comps, quants,
              dcTables, acTables, restartInterval)
          }
          // progressive scan header
          if (ns < 1 || ns > comps.length) fail()
          val sel = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val id = u8(); val tt = u8()
            val ci = comps.indexWhere(_.id == id)
            if (ci < 0) fail()
            comps(ci).dcId = tt >> 4; comps(ci).acId = tt & 0xf
            sel(i) = ci
            i += 1
          }
          val ss = u8(); val se = u8()
          val ahal = u8(); val ah = ahal >> 4; val al = ahal & 0xf
          if (pos != end) fail()
          if (ss == 0) { if (se != 0) fail() }
          else if (ns != 1 || se < ss || se > 63) fail()
          if (al > 13 || ah > 13 || (ah != 0 && ah != al + 1)) fail()
          if (coefPlanes == null) { // first scan: size the coefficient state
            hMax = comps.map(_.hSamp).max; vMax = comps.map(_.vSamp).max
            mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            if (width.toLong * height * comps.length > Int.MaxValue - 8) return None
            bwPad = comps.map(c => mcusX * c.hSamp)
            coefPlanes = comps.map { c =>
              val n = mcusX.toLong * c.hSamp * mcusY * c.vSamp * 64
              if (n > Int.MaxValue - 8) return None
              new Array[Int](n.toInt)
            }
          }
          val br = new BitReader(bytes, pos)
          decodeProgScan(br, width, height, comps, sel, coefPlanes, bwPad,
            mcusX, mcusY, hMax, vMax, dcTables, acTables,
            ss, se, ah, al, restartInterval)
          pos = br.pos
          sawScan = true
        case x if x >= 0xe0 && x <= 0xef => { val len = u16(); pos += len - 2 } // APPn
        case 0xfe => { val len = u16(); pos += len - 2 } // COM
        case _ => return None // anything else: not a payload we decode
      }
    }
    None
  }

  private def decodeScan(bytes: Array[Byte], start: Int, width: Int, height: Int,
                         comps: Array[DecComp], quants: Array[Array[Int]],
                         dcTables: Array[HuffTable], acTables: Array[HuffTable],
                         restartInterval: Int): Option[(Int, Int, Int, Array[Byte])] = {
    val hMax = comps.map(_.hSamp).max; val vMax = comps.map(_.vSamp).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // geometry guard (same Long discipline as pngPixels): the decoded
    // output and each padded plane must fit JVM arrays
    val outL = width.toLong * height * comps.length
    if (outL > Int.MaxValue - 8) return None
    val planes = comps.map { c =>
      val pw = mcusX.toLong * c.hSamp * 8; val ph = mcusY.toLong * c.vSamp * 8
      if (pw * ph > Int.MaxValue - 8) return None
      new Array[Int]((pw * ph).toInt)
    }
    val planeW = comps.map(c => mcusX * c.hSamp * 8)
    comps.foreach { c =>
      if (quants(c.quantId) == null || dcTables(c.dcId) == null ||
        acTables(c.acId) == null) return None
    }
    val br = new BitReader(bytes, start)
    val dcPred = new Array[Int](comps.length)
    val coefs = new Array[Double](64); val block = new Array[Double](64)
    var mcu = 0
    var rstCount = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart(rstCount % 8)
          rstCount += 1
          java.util.Arrays.fill(dcPred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = quants(c.quantId)
          val dcT = dcTables(c.dcId); val acT = acTables(c.acId)
          var by = 0
          while (by < c.vSamp) {
            var bx = 0
            while (bx < c.hSamp) {
              java.util.Arrays.fill(coefs, 0.0)
              val dcCat = br.decode(dcT)
              if (dcCat > 11) fail()
              val diff = extend(br.bits(dcCat), dcCat)
              dcPred(ci) += diff
              coefs(0) = dcPred(ci).toDouble * q(0)
              var zz = 1
              while (zz < 64) {
                val rs = br.decode(acT)
                val run = rs >> 4; val cat = rs & 0xf
                if (cat == 0) {
                  if (run == 15) zz += 16 // ZRL
                  else zz = 64 // EOB
                } else {
                  zz += run
                  if (zz > 63) fail()
                  val nat = ZigZag(zz)
                  coefs(nat) = extend(br.bits(cat), cat).toDouble * q(nat)
                  zz += 1
                }
              }
              idct(coefs, block)
              val px0 = (mx * c.hSamp + bx) * 8
              val py0 = (my * c.vSamp + by) * 8
              val pw = planeW(ci)
              var k = 0
              while (k < 64) {
                val v = clamp8(Math.round(block(k) + 128.0).toInt)
                planes(ci)((py0 + k / 8) * pw + px0 + k % 8) = v
                k += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    assemble(width, height, comps, planes, planeW)
  }

  /** Upsample (nearest) + YCbCr→RGB color transform of decoded planes —
    * shared by the baseline streaming path and the progressive
    * end-of-image reconstruction. */
  private def assemble(width: Int, height: Int, comps: Array[DecComp],
                       planes: Array[Array[Int]],
                       planeW: Array[Int]): Option[(Int, Int, Int, Array[Byte])] = {
    val hMax = comps.map(_.hSamp).max; val vMax = comps.map(_.vSamp).max
    val nc = comps.length
    val out = new Array[Byte](width * height * nc)
    if (nc == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { out(y * width + x) = planes(0)(y * pw + x).toByte; x += 1 }
        y += 1
      }
    } else {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            val sx = x * c.hSamp / hMax; val sy = y * c.vSamp / vMax
            planes(ci)(sy * planeW(ci) + sx)
          }
          val yv = sample(0).toDouble
          val cbv = sample(1) - 128.0
          val crv = sample(2) - 128.0
          val o = (y * width + x) * 3
          out(o) = clamp8(Math.round(yv + 1.402 * crv).toInt).toByte
          out(o + 1) = clamp8(Math.round(yv - 0.344136 * cbv - 0.714136 * crv).toInt).toByte
          out(o + 2) = clamp8(Math.round(yv + 1.772 * cbv).toInt).toByte
          x += 1
        }
        y += 1
      }
    }
    Some((width, height, nc, out))
  }

  /** Real block-grid dims of component `c` for NON-interleaved scans
    * (T.81 A.2.2): blocks over ceil(width·h/hMax) × ceil(height·v/vMax)
    * samples — smaller than the MCU-padded grid the coefficients are
    * stored in. */
  private def compBlocks(width: Int, height: Int, c: DecComp,
                         hMax: Int, vMax: Int): (Int, Int) = {
    val cw = (width * c.hSamp + hMax - 1) / hMax
    val ch = (height * c.vSamp + vMax - 1) / vMax
    ((cw + 7) / 8, (ch + 7) / 8)
  }

  /** One progressive scan (T.81 G.2): DC or AC band, first pass or
    * successive-approximation refinement, into the persistent
    * coefficient planes. DC scans may interleave several components in
    * MCU order; AC scans are single-component over the real block grid.
    * Coefficient values carry their final (already shifted) magnitude —
    * reconstruction just dequantizes and inverse-transforms. */
  private def decodeProgScan(br: BitReader, width: Int, height: Int,
                             comps: Array[DecComp], sel: Array[Int],
                             coefPlanes: Array[Array[Int]], bwPad: Array[Int],
                             mcusX: Int, mcusY: Int, hMax: Int, vMax: Int,
                             dcTables: Array[HuffTable], acTables: Array[HuffTable],
                             ss: Int, se: Int, ah: Int, al: Int,
                             restartInterval: Int): Unit = {
    val dcPred = new Array[Int](comps.length)
    var eobrun = 0
    var rstCount = 0
    var unit = 0 // MCUs (interleaved) or blocks (single-component)
    def maybeRestart(): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.restart(rstCount % 8); rstCount += 1
        java.util.Arrays.fill(dcPred, 0); eobrun = 0
      }

    def dcFirst(ci: Int, off: Int): Unit = {
      val t = dcTables(comps(ci).dcId); if (t == null) fail()
      val cat = br.decode(t)
      if (cat > 11) fail()
      dcPred(ci) += extend(br.bits(cat), cat)
      coefPlanes(ci)(off) = dcPred(ci) << al
    }
    def dcRefine(ci: Int, off: Int): Unit =
      if (br.bit() != 0) coefPlanes(ci)(off) |= 1 << al

    def acFirst(ci: Int, off: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      val t = acTables(comps(ci).acId); if (t == null) fail()
      val cf = coefPlanes(ci)
      var k = ss
      while (k <= se) {
        val rs = br.decode(t)
        val r = rs >> 4; val s = rs & 0xf
        if (s == 0) {
          if (r < 15) { // EOBn: run of (1<<r)+bits(r) all-done blocks
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.bits(r)
            return
          }
          k += 16 // ZRL
        } else {
          k += r
          if (k > se) fail()
          cf(off + ZigZag(k)) = extend(br.bits(s), s) << al
          k += 1
        }
      }
    }
    def acRefine(ci: Int, off: Int): Unit = {
      val bit = 1 << al
      val cf = coefPlanes(ci)
      def correct(k: Int): Unit = {
        val p = off + ZigZag(k)
        if (br.bit() != 0 && (cf(p) & bit) == 0)
          cf(p) += (if (cf(p) > 0) bit else -bit)
      }
      if (eobrun > 0) {
        eobrun -= 1
        var k = ss
        while (k <= se) { if (cf(off + ZigZag(k)) != 0) correct(k); k += 1 }
        return
      }
      val t = acTables(comps(ci).acId); if (t == null) fail()
      var k = ss
      while (k <= se) {
        val rs = br.decode(t)
        var r = rs >> 4; val s0 = rs & 0xf
        var newVal = 0
        if (s0 == 0) {
          if (r < 15) { // EOBn: correction bits still follow for this block
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.bits(r)
            r = 64 // no placement: drain the band reading correction bits
          } // r == 15: ZRL — skip 16 zero-history coefficients
        } else {
          if (s0 != 1) fail() // refinement introduces only ±1<<Al
          newVal = if (br.bit() != 0) bit else -bit
        }
        var done = false
        while (k <= se && !done) {
          val p = off + ZigZag(k)
          if (cf(p) != 0) correct(k)
          else {
            if (r == 0) {
              if (newVal != 0) cf(p) = newVal
              done = true
            } else r -= 1
          }
          k += 1
        }
      }
    }

    if (ss == 0) { // DC scan
      if (sel.length > 1) {
        // interleaved MCU order over the padded grid
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            maybeRestart()
            var i = 0
            while (i < sel.length) {
              val ci = sel(i); val c = comps(ci)
              var by = 0
              while (by < c.vSamp) {
                var bx = 0
                while (bx < c.hSamp) {
                  val off = ((my * c.vSamp + by) * bwPad(ci) +
                    mx * c.hSamp + bx) * 64
                  if (ah == 0) dcFirst(ci, off) else dcRefine(ci, off)
                  bx += 1
                }
                by += 1
              }
              i += 1
            }
            unit += 1
            mx += 1
          }
          my += 1
        }
      } else { // single-component DC scan: real block grid
        val ci = sel(0)
        val (w2, h2) = compBlocks(width, height, comps(ci), hMax, vMax)
        var by = 0
        while (by < h2) {
          var bx = 0
          while (bx < w2) {
            maybeRestart()
            val off = (by * bwPad(ci) + bx) * 64
            if (ah == 0) dcFirst(ci, off) else dcRefine(ci, off)
            unit += 1
            bx += 1
          }
          by += 1
        }
      }
    } else { // AC scan: always one component, real block grid
      val ci = sel(0)
      val (w2, h2) = compBlocks(width, height, comps(ci), hMax, vMax)
      var by = 0
      while (by < h2) {
        var bx = 0
        while (bx < w2) {
          maybeRestart()
          val off = (by * bwPad(ci) + bx) * 64
          if (ah == 0) acFirst(ci, off) else acRefine(ci, off)
          unit += 1
          bx += 1
        }
        by += 1
      }
    }
  }

  /** Final progressive reconstruction at EOI: dequantize every stored
    * coefficient block, IDCT, clamp into planes, then the shared
    * upsample + color transform. */
  private def reconstructProgressive(width: Int, height: Int,
                                     comps: Array[DecComp],
                                     quants: Array[Array[Int]],
                                     coefPlanes: Array[Array[Int]],
                                     bwPad: Array[Int],
                                     mcusX: Int, mcusY: Int): Option[(Int, Int, Int, Array[Byte])] = {
    comps.foreach(c => if (quants(c.quantId) == null) return None)
    val planes = comps.zipWithIndex.map { case (c, ci) =>
      new Array[Int](bwPad(ci) * 8 * mcusY * c.vSamp * 8)
    }
    val planeW = comps.zipWithIndex.map { case (_, ci) => bwPad(ci) * 8 }
    val coefs = new Array[Double](64); val block = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      val q = quants(c.quantId)
      val cf = coefPlanes(ci)
      val bw = bwPad(ci); val bh = mcusY * c.vSamp
      val pw = planeW(ci)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val off = (by * bw + bx) * 64
          var k = 0
          while (k < 64) { coefs(k) = cf(off + k).toDouble * q(k); k += 1 }
          idct(coefs, block)
          val px0 = bx * 8; val py0 = by * 8
          k = 0
          while (k < 64) {
            val v = clamp8(Math.round(block(k) + 128.0).toInt)
            planes(ci)((py0 + k / 8) * pw + px0 + k % 8) = v
            k += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    assemble(width, height, comps, planes, planeW)
  }
}
