package graft.multimodal

/** Pure-JVM FLAC codec (the xiph FLAC format / RFC 9639) — the audio
  * format speech training corpora actually ship (LibriSpeech et al.).
  * FLAC is LOSSLESS, so unlike JPEG no fixture trickery is needed for
  * oracle checks: any decode must reproduce the original PCM samples
  * bit-for-bit.
  *
  * Decoder scope: 16-bit streams, fixed-blocksize frames, CONSTANT /
  * VERBATIM / FIXED (orders 0-4) / LPC (any order) subframes, all four
  * channel assignments (independent, left/side, right/side, mid/side),
  * 4-bit rice residual partitions including the 5-bit escape, wasted
  * bits, and both frame CRCs (CRC-8 header, CRC-16 frame) verified —
  * a corrupt frame refuses the whole clip (loud, never a partial
  * decode, the repo's media rule). Unsupported shapes (non-16-bit
  * sample size, STREAMINFO total-samples=0 — the spec's "unknown
  * length", which the fixed-output-array design can't size) return
  * None loudly. Variable-blocksize streams ARE accepted: the coded
  * frame/sample number is consumed either way and frames decode
  * sequentially, so the blocking strategy doesn't change the output.
  *
  * Encoder scope (fixtures + round-trip tests): fixed-blocksize frames,
  * per-subframe predictor search — best FIXED order 0-2, an order-8
  * LPC candidate (autocorrelation → Levinson-Durbin → 12-bit quantized
  * coefficients), VERBATIM when entropy coding would lose — each
  * rice-planned with per-partition cost-optimal parameters (partition
  * orders 0-6, 5-bit raw escape); independent / mid-side / left-side
  * stereo modes. Real compression with real rice codes, so round trips
  * drive every decoder path with genuinely entropy-coded streams.
  *
  * All structure here is from the public FLAC spec; like [[Jpeg]] and
  * [[Gif]], integer-exact end to end.
  */
object Flac {

  def isFlac(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  // ---- bit I/O -------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def bits(v: Long, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1L); n += 1
        if (n == 8) { out.write((acc & 0xff).toInt); acc = 0; n = 0 }
        i -= 1
      }
    }
    def unary(q: Int): Unit = { var i = 0; while (i < q) { bits(0, 1); i += 1 }; bits(1, 1) }
    def align(): Unit = if (n > 0) bits(0, 8 - n)
    def toByteArray: Array[Byte] = { align(); out.toByteArray }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length) throw new java.io.EOFException()
        acc = b(pos) & 0xff; pos += 1; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def bits(len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def signedBits(len: Int): Int = {
      val v = bits(len)
      (v << (64 - len) >> (64 - len)).toInt // sign extend
    }
    def unary(): Int = { var q = 0; while (bit() == 0) q += 1; q }
    def align(): Unit = n = 0
    def atByte: Boolean = n == 0
  }

  // ---- CRCs (spec polynomials) ---------------------------------------------

  private[graft] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff; k += 1 }
      i += 1
    }
    crc
  }

  private[graft] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) { crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff else (crc << 1) & 0xffff; k += 1 }
      i += 1
    }
    crc
  }

  // ---- encoder ---------------------------------------------------------------

  /** Stereo decorrelation modes the encoder can emit. */
  object Mode extends Enumeration { val Independent, MidSide, LeftSide = Value }

  /** Encode 16-bit PCM (`samples(channel)(i)`) as a FLAC stream.
    * Frames are `blockSize` samples (last frame shorter); each subframe
    * picks the best FIXED order 0-2 by residual magnitude, falling back
    * to VERBATIM when rice coding would lose. */
  def encode(sampleRate: Int, samples: Array[Array[Int]],
             blockSize: Int = 4096,
             mode: Mode.Value = Mode.Independent): Array[Byte] = {
    val channels = samples.length
    require(channels >= 1 && channels <= 8, s"channels $channels")
    require(mode == Mode.Independent || channels == 2,
      "stereo decorrelation needs exactly 2 channels")
    require(sampleRate > 0 && sampleRate < (1 << 20), s"rate $sampleRate")
    require(blockSize >= 16 && blockSize <= 65535, s"blockSize $blockSize")
    val total = samples.head.length.toLong
    require(total > 0, "need at least one sample")
    require(total / blockSize < 0xffff, "too many frames for 3-byte numbering")
    samples.foreach(c => require(c.length == total, "ragged channels"))
    samples.foreach(_.foreach(s =>
      require(s >= Short.MinValue && s <= Short.MaxValue, "16-bit range")))

    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO, last-metadata flag set
    val si = new BitWriter
    si.bits(blockSize.toLong, 16); si.bits(blockSize.toLong, 16) // min/max block
    si.bits(0, 24); si.bits(0, 24)                     // min/max frame: unset
    si.bits(sampleRate.toLong, 20)
    si.bits((channels - 1).toLong, 3)
    si.bits(15, 5)                                     // bps - 1 = 15
    si.bits(total, 36)
    (0 until 16).foreach(_ => si.bits(0, 8))           // MD5 unset
    val siB = si.toByteArray
    out.write(0x80); out.write(0); out.write(0); out.write(siB.length)
    out.write(siB)

    var frameIdx = 0L
    var off = 0
    while (off < total) {
      val bs = math.min(blockSize.toLong, total - off).toInt
      out.write(encodeFrame(frameIdx, bs, sampleRate, samples, off, mode))
      off += bs
      frameIdx += 1
    }
    out.toByteArray
  }

  private def encodeFrame(frameIdx: Long, bs: Int, sampleRate: Int,
                          samples: Array[Array[Int]], off: Int,
                          mode: Mode.Value): Array[Byte] = {
    val channels = samples.length
    val chanAssign = mode match {
      case Mode.Independent => channels - 1
      case Mode.LeftSide => 8
      case Mode.MidSide => 10
    }
    val bw = new BitWriter
    bw.bits(0x3ffe, 14) // sync
    bw.bits(0, 1)       // reserved
    bw.bits(0, 1)       // fixed blocksize stream
    bw.bits(0x7, 4)     // block size: 16-bit at end of header (bs - 1)
    bw.bits(0, 4)       // sample rate: from STREAMINFO
    bw.bits(chanAssign.toLong, 4)
    bw.bits(0x4, 3)     // sample size: 16-bit
    bw.bits(0, 1)       // reserved
    // frame number, UTF-8 style (fits 7 bits for our fixtures' sizes;
    // general multi-byte form for larger indexes)
    utf8Number(bw, frameIdx)
    bw.bits((bs - 1).toLong, 16)
    val headNoCrc = bw.toByteArray // align() is a no-op: header is byte-aligned
    val withCrc = new BitWriter
    headNoCrc.foreach(x => withCrc.bits((x & 0xff).toLong, 8))
    withCrc.bits(crc8(headNoCrc, 0, headNoCrc.length).toLong, 8)

    // channel planes after decorrelation
    val planes: Array[(Array[Int], Int)] = mode match { // (plane, bps)
      case Mode.Independent =>
        samples.map(c => (java.util.Arrays.copyOfRange(c, off, off + bs), 16))
      case Mode.LeftSide =>
        val l = java.util.Arrays.copyOfRange(samples(0), off, off + bs)
        val side = Array.tabulate(bs)(i => samples(0)(off + i) - samples(1)(off + i))
        Array((l, 16), (side, 17))
      case Mode.MidSide =>
        val mid = Array.tabulate(bs)(i =>
          (samples(0)(off + i) + samples(1)(off + i)) >> 1)
        val side = Array.tabulate(bs)(i => samples(0)(off + i) - samples(1)(off + i))
        Array((mid, 16), (side, 17))
    }
    planes.foreach { case (p, bps) => writeSubframe(withCrc, p, bps) }
    withCrc.align()
    val body = withCrc.toByteArray
    val outw = new java.io.ByteArrayOutputStream()
    outw.write(body)
    val c16 = crc16(body, 0, body.length)
    outw.write((c16 >> 8) & 0xff); outw.write(c16 & 0xff)
    outw.toByteArray
  }

  private def utf8Number(bw: BitWriter, v: Long): Unit =
    if (v < 0x80) bw.bits(v, 8)
    else if (v < 0x800) {
      bw.bits(0xc0L | (v >> 6), 8); bw.bits(0x80L | (v & 0x3f), 8)
    } else {
      bw.bits(0xe0L | (v >> 12), 8)
      bw.bits(0x80L | ((v >> 6) & 0x3f), 8); bw.bits(0x80L | (v & 0x3f), 8)
    }

  /** Best fixed order 0-2 by sum of |residual|; verbatim fallback. */
  /** One residual rice plan: partition order + per-partition params. */
  private final case class Part(param: Int, raw: Int, cost: Long) // raw>0 ⇒ escape
  private final case class RicePlan(po: Int, parts: Array[Part], cost: Long)

  /** Rice planning, the real FLAC encoder shape: try every legal
    * partition order (bs divisible, first partition covers the warmup),
    * size each partition's parameter by exhaustive cost over 0..14 with
    * the 5-bit raw escape as a 15th candidate, keep the cheapest plan.
    * Per-partition parameters are what make mixed content compress —
    * one outlier region no longer inflates every residual's width. */
  private def planRice(res: Array[Long], bs: Int, order: Int): Option[RicePlan] = {
    def planPartition(zs: Array[Long], signedMax: Int): Part = {
      var best = Part(0, 0, Long.MaxValue)
      var prm = 0
      while (prm <= 14) {
        var c = 0L
        var i = 0
        while (i < zs.length) { c += (zs(i) >>> prm) + 1 + prm; i += 1 }
        if (c < best.cost) best = Part(prm, 0, c)
        prm += 1
      }
      val rawBits = signedMax + 1 // signed residuals need bitlen+1
      if (rawBits <= 31) {
        val c = zs.length.toLong * rawBits
        if (c < best.cost) best = Part(0, rawBits, c)
      }
      best
    }
    val zig = res.map(zigzag)
    val sMax =
      if (res.isEmpty) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(zig.max)
    var best: Option[RicePlan] = None
    var po = 0
    while (po <= 6 && (1 << po) <= bs) {
      val parts = 1 << po
      if (bs % parts == 0 && bs / parts > order) {
        val plan = new Array[Part](parts)
        var cost = 4L * parts + 4 // per-partition params + partition order
        var pi = 0
        var idx = 0
        while (pi < parts) {
          val n = (bs / parts) - (if (pi == 0) order else 0)
          plan(pi) = planPartition(
            java.util.Arrays.copyOfRange(zig, idx, idx + n), sMax)
          cost += plan(pi).cost + (if (plan(pi).raw > 0) 5 else 0)
          idx += n
          pi += 1
        }
        if (best.forall(_.cost > cost)) best = Some(RicePlan(po, plan, cost))
      }
      po += 1
    }
    best
  }

  private def emitResidual(bw: BitWriter, res: Array[Long], bs: Int,
                           order: Int, plan: RicePlan): Unit = {
    val zig = res.map(zigzag)
    bw.bits(0, 2) // residual method: 4-bit rice
    bw.bits(plan.po.toLong, 4)
    val parts = 1 << plan.po
    var pi = 0
    var idx = 0
    while (pi < parts) {
      val n = (bs / parts) - (if (pi == 0) order else 0)
      val part = plan.parts(pi)
      if (part.raw > 0) { // 5-bit escape: raw signed residuals
        bw.bits(0xf, 4); bw.bits(part.raw.toLong, 5)
        var i = idx
        while (i < idx + n) {
          bw.bits(res(i) & ((1L << part.raw) - 1), part.raw); i += 1
        }
      } else {
        bw.bits(part.param.toLong, 4)
        var i = idx
        while (i < idx + n) {
          val z = zig(i)
          bw.unary((z >>> part.param).toInt)
          if (part.param > 0) bw.bits(z & ((1L << part.param) - 1), part.param)
          i += 1
        }
      }
      idx += n
      pi += 1
    }
  }

  /** LPC candidate: autocorrelation → Levinson-Durbin → coefficients
    * quantized to 12-bit precision with a non-negative shift. The
    * QUALITY of the floats affects only compression — the emitted
    * stream carries the quantized integers, and encode and decode run
    * the identical integer prediction, so round trips stay bit-exact
    * regardless. Returns (order, precision, shift, coefs, residual). */
  private def buildLpc(p: Array[Int]): Option[(Int, Int, Int, Array[Int], Array[Long])] = {
    val n = p.length
    val order = math.min(8, n - 1)
    if (order < 1) return None
    val ac = new Array[Double](order + 1)
    var lag = 0
    while (lag <= order) {
      var s = 0.0
      var i = lag
      while (i < n) { s += p(i).toDouble * p(i - lag); i += 1 }
      ac(lag) = s
      lag += 1
    }
    if (ac(0) <= 0) return None // silence: constant/fixed handle it
    val lpc = new Array[Double](order)
    var err = ac(0)
    var i = 0
    while (i < order) {
      var acc = ac(i + 1)
      var j = 0
      while (j < i) { acc -= lpc(j) * ac(i - j); j += 1 }
      val k = acc / err
      val prev = java.util.Arrays.copyOf(lpc, i)
      j = 0
      while (j < i) { lpc(j) = prev(j) - k * prev(i - 1 - j); j += 1 }
      lpc(i) = k
      err *= 1 - k * k
      if (err <= 0 || err.isNaN) return None
      i += 1
    }
    val prec = 12
    val cmax = lpc.map(math.abs).max
    if (!(cmax > 0) || cmax.isInfinite) return None
    // shift so the largest |coef| fits prec-1 magnitude bits
    var shift = prec - 2 - math.getExponent(cmax)
    if (shift > 15) shift = 15
    if (shift < 0) return None // wild predictor: not worth raw-coding
    val q = lpc.map(c => math.round(c * (1L << shift)).toInt)
    if (q.exists(c => c < -(1 << (prec - 1)) || c >= (1 << (prec - 1))))
      return None
    val res = new Array[Long](n - order)
    i = order
    while (i < n) {
      var acc = 0L
      var j = 0
      while (j < order) { acc += q(j).toLong * p(i - 1 - j); j += 1 }
      res(i - order) = p(i).toLong - (acc >> shift)
      i += 1
    }
    Some((order, prec, shift, q, res))
  }

  /** Candidate search: best FIXED order 0-2 (by residual magnitude) and
    * an order-8 LPC predictor, each rice-planned; the cheaper of the
    * two emits unless VERBATIM beats both. Returns the choice made
    * ("lpc"/"fixed"/"verbatim") so specs can pin predictor selection. */
  private[graft] def writeSubframeForTest(p: Array[Int], bps: Int): String =
    writeSubframe(new BitWriter, p, bps)

  private def writeSubframe(bw: BitWriter, p: Array[Int], bps: Int): String = {
    val bs = p.length
    def residual(order: Int): Array[Long] = order match {
      case 0 => p.map(_.toLong)
      case 1 => Array.tabulate(bs - 1)(i => p(i + 1).toLong - p(i))
      case 2 => Array.tabulate(bs - 2)(i =>
        p(i + 2).toLong - 2L * p(i + 1) + p(i))
    }
    val candidates = (0 to math.min(2, bs - 1)).map(o => (o, residual(o)))
    val (fOrder, fRes) = candidates.minBy(_._2.map(math.abs).sum)
    val fixedPlan = planRice(fRes, bs, fOrder)
      .map(pl => (pl, pl.cost + fOrder.toLong * bps + 8))
    val lpcCand = buildLpc(p).flatMap { case (o, prec, shift, coefs, res) =>
      planRice(res, bs, o).map { pl =>
        ((o, prec, shift, coefs, res), pl,
          pl.cost + o.toLong * bps + 4 + 5 + o.toLong * prec + 8)
      }
    }
    val verbatimCost = bs.toLong * bps + 8
    val fixedCost = fixedPlan.map(_._2).getOrElse(Long.MaxValue)
    val lpcCost = lpcCand.map(_._3).getOrElse(Long.MaxValue)
    if (verbatimCost <= fixedCost && verbatimCost <= lpcCost) {
      bw.bits(0, 1); bw.bits(1, 6); bw.bits(0, 1) // type=verbatim, no wasted
      p.foreach(s => bw.bits(s.toLong & ((1L << bps) - 1), bps))
      "verbatim"
    } else if (lpcCost < fixedCost) {
      val ((o, prec, shift, coefs, res), pl, _) = lpcCand.get
      bw.bits(0, 1); bw.bits(32L | (o - 1), 6); bw.bits(0, 1) // LPC(o)
      (0 until o).foreach(i => bw.bits(p(i).toLong & ((1L << bps) - 1), bps))
      bw.bits((prec - 1).toLong, 4)
      bw.bits(shift.toLong, 5)
      coefs.foreach(c => bw.bits(c.toLong & ((1L << prec) - 1), prec))
      emitResidual(bw, res, bs, o, pl)
      "lpc"
    } else {
      bw.bits(0, 1); bw.bits(8L + fOrder, 6); bw.bits(0, 1) // fixed(order)
      (0 until fOrder).foreach(i =>
        bw.bits(p(i).toLong & ((1L << bps) - 1), bps))
      emitResidual(bw, fRes, bs, fOrder, fixedPlan.get._1)
      "fixed"
    }
  }

  private def zigzag(v: Long): Long = if (v >= 0) v << 1 else (-v << 1) - 1

  // ---- decoder ---------------------------------------------------------------

  /** Header-only STREAMINFO read: (sampleRate, channels, totalSamples)
    * — no frame decode, for [[Media.HeaderDecoder]]-style metadata. */
  def info(b: Array[Byte]): Option[(Int, Int, Long)] = {
    if (!isFlac(b) || b.length < 8 + 18) return None
    if ((b(4) & 0x7f) != 0) return None // first block must be STREAMINFO
    val br = new BitReader(b, 8)
    try {
      br.bits(16); br.bits(16); br.bits(24); br.bits(24)
      val rate = br.bits(20).toInt
      val ch = br.bits(3).toInt + 1
      br.bits(5)
      val total = br.bits(36)
      if (rate <= 0) None else Some((rate, ch, total))
    } catch { case _: java.io.EOFException => None }
  }

  /** (sampleRate, channels, samples(channel)(i)) — None for anything
    * outside scope or failing either CRC (loud, never partial). */
  def decode(b: Array[Byte]): Option[(Int, Int, Array[Array[Int]])] =
    try decodeOrThrow(b) catch {
      case _: java.io.EOFException | _: ArrayIndexOutOfBoundsException |
           _: IllegalArgumentException | _: NegativeArraySizeException => None
    }

  private def decodeOrThrow(b: Array[Byte]): Option[(Int, Int, Array[Array[Int]])] = {
    if (!isFlac(b)) return None
    var pos = 4
    var sampleRate = 0; var channels = 0; var total = 0L
    var minBlock = 0
    var sawStreamInfo = false
    var last = false
    while (!last) { // metadata blocks
      if (pos + 4 > b.length) return None
      val h = b(pos) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((b(pos + 1) & 0xff) << 16) | ((b(pos + 2) & 0xff) << 8) |
        (b(pos + 3) & 0xff)
      pos += 4
      if (pos + len > b.length) return None
      if (btype == 0) { // STREAMINFO
        val br = new BitReader(b, pos)
        minBlock = br.bits(16).toInt; br.bits(16)
        br.bits(24); br.bits(24)
        sampleRate = br.bits(20).toInt
        channels = br.bits(3).toInt + 1
        val bps = br.bits(5).toInt + 1
        if (bps != 16) return None // scope: 16-bit
        total = br.bits(36)
        sawStreamInfo = true
      }
      pos += len
    }
    if (!sawStreamInfo || sampleRate <= 0 || channels < 1) return None
    // total=0 is FLAC's "unknown length" sentinel, not an empty clip —
    // the fixed-output-array decode can't size it: refuse loudly
    if (total == 0) return None
    if (total > Int.MaxValue / math.max(channels, 1) / 4) return None
    val out = Array.fill(channels)(new Array[Int](total.toInt))
    var got = 0L
    while (got < total) {
      val (n, newPos) = decodeFrame(b, pos, channels, sampleRate, out, got.toInt)
      got += n
      pos = newPos
    }
    Some((sampleRate, channels, out))
  }

  private def decodeFrame(b: Array[Byte], start: Int, channels: Int,
                          sampleRate: Int, out: Array[Array[Int]],
                          at: Int): (Int, Int) = {
    val br = new BitReader(b, start)
    if (br.bits(14) != 0x3ffe) fail()
    if (br.bit() != 0) fail()
    val variable = br.bit() // 1 = variable blocksize (accepted, rare)
    val bsCode = br.bits(4).toInt
    val srCode = br.bits(4).toInt
    val chanAssign = br.bits(4).toInt
    val ssCode = br.bits(3).toInt
    if (br.bit() != 0) fail()
    if (ssCode != 0x4) fail() // 16-bit only (0b100)
    // coded frame/sample number: UTF-8 style, 1-7 bytes
    val first = br.bits(8).toInt
    var extra = 0
    if ((first & 0x80) != 0) {
      var m = first
      while ((m & 0x40) != 0) { extra += 1; m <<= 1 }
      if (extra == 0) fail()
      (0 until extra).foreach { _ => if ((br.bits(8).toInt & 0xc0) != 0x80) fail() }
    }
    val blockSize = bsCode match {
      case 0 => fail()
      case 1 => 192
      case x if x >= 2 && x <= 5 => 576 << (x - 2)
      case 6 => br.bits(8).toInt + 1
      case 7 => br.bits(16).toInt + 1
      case x => 256 << (x - 8)
    }
    srCode match { // consume any trailing sample-rate field
      case 12 => br.bits(8)
      case 13 | 14 => br.bits(16)
      case 15 => fail()
      case _ =>
    }
    if (!br.atByte) fail() // header is byte-aligned before the CRC
    val headEnd = br.pos
    if (crc8(b, start, headEnd) != br.bits(8).toInt) fail()

    val nCh = chanAssign match {
      case x if x <= 7 => x + 1
      case 8 | 9 | 10 => 2
      case _ => fail()
    }
    if (nCh != channels) fail()
    val planes = Array.ofDim[Array[Int]](nCh)
    var ci = 0
    while (ci < nCh) {
      val bps = 16 + (chanAssign match {
        case 8 => if (ci == 1) 1 else 0  // left/side
        case 9 => if (ci == 0) 1 else 0  // side/right
        case 10 => if (ci == 1) 1 else 0 // mid/side
        case _ => 0
      })
      planes(ci) = decodeSubframe(br, blockSize, bps)
      ci += 1
    }
    br.align()
    val bodyEnd = br.pos
    val c16 = ((br.bits(8).toInt << 8) | br.bits(8).toInt)
    if (crc16(b, start, bodyEnd) != c16) fail()

    // undo stereo decorrelation
    val (l, r) = chanAssign match {
      case 8 => // left/side: r = l - side
        (planes(0), Array.tabulate(blockSize)(i => planes(0)(i) - planes(1)(i)))
      case 9 => // side/right: l = r + side
        (Array.tabulate(blockSize)(i => planes(1)(i) + planes(0)(i)), planes(1))
      case 10 => // mid/side
        val lArr = new Array[Int](blockSize); val rArr = new Array[Int](blockSize)
        var i = 0
        while (i < blockSize) {
          val s = planes(1)(i)
          val m = (planes(0)(i) << 1) | (s & 1)
          lArr(i) = (m + s) >> 1; rArr(i) = (m - s) >> 1
          i += 1
        }
        (lArr, rArr)
      case _ => (null, null)
    }
    if (at + blockSize > out(0).length) fail()
    if (chanAssign <= 7) {
      ci = 0
      while (ci < nCh) {
        System.arraycopy(planes(ci), 0, out(ci), at, blockSize); ci += 1
      }
    } else {
      System.arraycopy(l, 0, out(0), at, blockSize)
      System.arraycopy(r, 0, out(1), at, blockSize)
    }
    (blockSize, br.pos)
  }

  private def decodeSubframe(br: BitReader, bs: Int, bps0: Int): Array[Int] = {
    if (br.bit() != 0) fail()
    val t = br.bits(6).toInt
    var wasted = 0
    if (br.bit() == 1) { wasted = br.unary() + 1 }
    val bps = bps0 - wasted
    val p: Array[Int] = t match {
      case 0 => // constant
        val v = br.signedBits(bps); Array.fill(bs)(v)
      case 1 => // verbatim
        Array.fill(bs)(br.signedBits(bps))
      case x if x >= 8 && x <= 12 => // fixed order 0-4
        val order = x - 8
        val warm = Array.fill(order)(br.signedBits(bps))
        val res = readResidual(br, bs, order)
        val s = new Array[Int](bs)
        System.arraycopy(warm, 0, s, 0, order)
        var i = order
        while (i < bs) {
          val pred: Long = order match {
            case 0 => 0L
            case 1 => s(i - 1).toLong
            case 2 => 2L * s(i - 1) - s(i - 2)
            case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
            case 4 => 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
          }
          s(i) = (pred + res(i - order)).toInt
          i += 1
        }
        s
      case x if x >= 32 => // LPC, order = low 5 bits + 1
        val order = (x & 0x1f) + 1
        val warm = Array.fill(order)(br.signedBits(bps))
        val prec = br.bits(4).toInt + 1
        if (prec == 16) fail() // 0b1111 is invalid per spec
        val shift = {
          val v = br.bits(5); (v << 59 >> 59).toInt // signed 5-bit
        }
        if (shift < 0) fail()
        val coefs = Array.fill(order)(br.signedBits(prec))
        val res = readResidual(br, bs, order)
        val s = new Array[Int](bs)
        System.arraycopy(warm, 0, s, 0, order)
        var i = order
        while (i < bs) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * s(i - 1 - j); j += 1 }
          s(i) = ((acc >> shift) + res(i - order)).toInt
          i += 1
        }
        s
      case _ => fail()
    }
    if (wasted > 0) p.map(_ << wasted) else p
  }

  private def readResidual(br: BitReader, bs: Int, predOrder: Int): Array[Long] = {
    val method = br.bits(2).toInt
    if (method > 1) fail()
    val pbits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val po = br.bits(4).toInt
    val parts = 1 << po
    if (bs % parts != 0) fail()
    val res = new Array[Long](bs - predOrder)
    var idx = 0
    var pi = 0
    while (pi < parts) {
      val n = (bs / parts) - (if (pi == 0) predOrder else 0)
      if (n < 0) fail()
      val param = br.bits(pbits).toInt
      if (param == escape) {
        val raw = br.bits(5).toInt
        var i = 0
        while (i < n) {
          res(idx) = if (raw == 0) 0L else (br.bits(raw) << (64 - raw)) >> (64 - raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < n) {
          val q = br.unary().toLong
          val z = (q << param) | (if (param > 0) br.bits(param) else 0L)
          res(idx) = if ((z & 1) == 0) z >>> 1 else -((z + 1) >>> 1)
          idx += 1; i += 1
        }
      }
      pi += 1
    }
    res
  }

  private def fail(): Nothing = throw new IllegalArgumentException("malformed FLAC")
}
