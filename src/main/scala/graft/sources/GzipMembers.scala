package graft.sources

/** Strict multi-member gzip decoding (RFC 1952) with member-boundary
  * visibility — the piece `java.util.zip.GZIPInputStream` lacks twice
  * over for crawl-archive reads:
  *
  *  1. STRICTNESS. GZIPInputStream treats a malformed SUBSEQUENT member
  *     header (or trailing garbage) as clean EOF, so a Common Crawl
  *     archive corrupted at a member boundary — which is also a record
  *     boundary — silently truncates the record set. Here, any byte
  *     after a member's trailer MUST begin a valid next member; anything
  *     else throws. Per-member CRC32 and ISIZE are verified like
  *     GZIPInputStream does.
  *  2. BOUNDARY OFFSETS. Member-indexed split planning
  *     ([[Warc.buildCutIndex]]) needs the COMPRESSED byte offset where
  *     each member starts (the seek targets of range slices) and the
  *     INFLATED offset of its first output byte (to prove the member
  *     starts on a record boundary). The `onMember` callback delivers
  *     both, exactly once per member, before that member's first
  *     inflated byte is served.
  *
  * Single forward pass, O(1) heap (two 64 KiB buffers + one Inflater);
  * inflation itself is the same zlib `Inflater` GZIPInputStream uses, so
  * throughput matches. Not thread-safe; close() releases the Inflater
  * but NOT `raw` (the caller owns it).
  */
final class MemberGzipInputStream(
    raw: java.io.InputStream,
    onMember: (Long, Long) => Unit = (_, _) => ())
    extends java.io.InputStream {

  private val inflater = new java.util.zip.Inflater(true) // raw deflate
  private val crc = new java.util.zip.CRC32

  // compressed side: one buffer over `raw`; the absolute offset of the
  // next unconsumed byte is rawRead - (clen - cpos)
  private val cbuf = new Array[Byte](1 << 16)
  private var cpos = 0
  private var clen = 0
  private var rawRead = 0L

  // inflated side
  private val obuf = new Array[Byte](1 << 16)
  private var opos = 0
  private var olen = 0
  private var inflatedTotal = 0L // across all members, bytes served so far
  private var memberInflated = 0L

  private var inMember = false // between header parse and trailer check
  private var eof = false

  private def compressedPos: Long = rawRead - (clen - cpos)

  /** Refill the compressed buffer; false on raw EOF with nothing left. */
  private def fill(): Boolean = {
    if (cpos < clen) return true
    val n = raw.read(cbuf, 0, cbuf.length)
    if (n < 0) false
    else { cpos = 0; clen = n; rawRead += n; true }
  }

  private def fail(reason: String): Nothing =
    throw new java.io.IOException(s"malformed gzip stream: $reason")

  private def u8(): Int = {
    if (!fill()) fail("EOF inside a member header/trailer")
    val b = cbuf(cpos) & 0xff; cpos += 1; b
  }

  /** Parse one member header at the current position. Returns false iff
    * the stream is cleanly exhausted (EOF exactly at a member boundary);
    * throws on ANY other shape — a partial or invalid header here is the
    * silent-truncation case GZIPInputStream hides. */
  private def parseHeader(): Boolean = {
    if (!fill()) return false // clean EOF between members
    val start = compressedPos
    // header CRC runs over every header byte up to (excluding) the FHCRC
    // field itself — GZIPInputStream verifies this; strictness parity
    // demands we do too
    val hcrc = new java.util.zip.CRC32
    def h8(): Int = { val b = u8(); hcrc.update(b); b }
    def hskip(n: Int): Unit = (0 until n).foreach(_ => h8())
    def hskipZero(): Unit = { var b = h8(); while (b != 0) b = h8() }
    val id1 = h8()
    val id2 = if (fill()) h8() else fail("EOF after one header byte")
    if (id1 != 0x1f || id2 != 0x8b)
      fail(f"bad member magic 0x$id1%02x 0x$id2%02x at offset $start")
    if (h8() != 8) fail("unsupported compression method (CM != deflate)")
    val flg = h8()
    if ((flg & 0xe0) != 0) fail(f"reserved FLG bits set (0x$flg%02x)")
    hskip(6) // MTIME(4) XFL OS
    if ((flg & 0x04) != 0) { // FEXTRA: 2-byte little-endian length
      val xlen = h8() | (h8() << 8)
      hskip(xlen)
    }
    if ((flg & 0x08) != 0) hskipZero() // FNAME
    if ((flg & 0x10) != 0) hskipZero() // FCOMMENT
    if ((flg & 0x02) != 0) {           // FHCRC: low 16 bits of header CRC32
      val stored = u8() | (u8() << 8)
      val computed = (hcrc.getValue & 0xffffL).toInt
      if (stored != computed)
        fail(f"member header CRC mismatch (stored 0x$stored%04x, computed 0x$computed%04x)")
    }
    inflater.reset()
    crc.reset()
    memberInflated = 0L
    inMember = true
    onMember(start, inflatedTotal)
    true
  }

  /** Read the 8-byte member trailer and verify CRC32 + ISIZE. */
  private def checkTrailer(): Unit = {
    var crcVal = 0L
    var i = 0
    while (i < 4) { crcVal |= u8().toLong << (8 * i); i += 1 }
    var isize = 0L
    i = 0
    while (i < 4) { isize |= u8().toLong << (8 * i); i += 1 }
    if (crcVal != crc.getValue)
      fail(f"member CRC mismatch (stored 0x$crcVal%08x, computed 0x${crc.getValue}%08x)")
    if (isize != (memberInflated & 0xffffffffL))
      fail(s"member ISIZE mismatch (stored $isize, inflated $memberInflated)")
    inMember = false
  }

  /** Produce more inflated bytes into obuf; false on overall clean EOF. */
  private def produce(): Boolean = {
    opos = 0; olen = 0
    while (olen == 0) {
      if (!inMember && !parseHeader()) { eof = true; return false }
      if (inflater.finished()) {
        // return unconsumed fed bytes to the buffer, then trailer
        cpos -= inflater.getRemaining
        checkTrailer()
      } else {
        if (inflater.needsInput()) {
          if (!fill()) fail("EOF inside a member's deflate stream")
          inflater.setInput(cbuf, cpos, clen - cpos)
          cpos = clen
        }
        val n =
          try inflater.inflate(obuf, 0, obuf.length)
          catch {
            case e: java.util.zip.DataFormatException =>
              fail(s"corrupt deflate data (${e.getMessage})")
          }
        if (n > 0) {
          crc.update(obuf, 0, n)
          memberInflated += n
          olen = n
        } else if (inflater.finished()) {
          cpos -= inflater.getRemaining
          checkTrailer()
        } else if (inflater.needsDictionary()) {
          fail("deflate stream demands a preset dictionary")
        }
      }
    }
    true
  }

  override def read(): Int = {
    if (eof) return -1
    if (opos >= olen && !produce()) return -1
    val b = obuf(opos) & 0xff
    opos += 1
    inflatedTotal += 1
    b
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    if (eof) return -1
    if (opos >= olen && !produce()) return -1
    val n = math.min(len, olen - opos)
    System.arraycopy(obuf, opos, b, off, n)
    opos += n
    inflatedTotal += n
    n
  }

  override def available(): Int = if (eof) 0 else olen - opos

  /** Discard up to `n` inflated bytes without copying them out (the
    * inherited skip() copies through a scratch buffer). May skip less
    * than `n` (one produce() worth); callers loop. */
  override def skip(n: Long): Long = {
    if (n <= 0 || eof) return 0
    if (opos >= olen && !produce()) return 0
    val k = math.min(n, (olen - opos).toLong).toInt
    opos += k
    inflatedTotal += k
    k
  }

  override def close(): Unit = inflater.end()
}
