package graft.sources

import graft.multimodal.Media
import org.apache.spark.sql.{DataFrame, Dataset}

/** Pure-JVM WARC (ISO 28500) web-archive source — the step-0 ingestion
  * format of web-crawl training corpora (Common Crawl ships WARC). The
  * reference engine has no web-crawl path at all; this extends the
  * engine for crawl preprocessing: WARC record walk → HTTP response
  * split → body text, feeding the existing curation chain
  * (`Corpus.stripHtml` → C4/Gopher rules → dedup).
  *
  * Scope: WARC/1.0 and /1.1, plain AND per-record-gzipped (the Common
  * Crawl convention: each record is its own gzip member, members
  * concatenated — `java.util.zip.GZIPInputStream` reads multi-member
  * streams natively). Record headers are parsed for WARC-Type,
  * WARC-Target-URI, and the mandatory Content-Length; `response`
  * records additionally split their HTTP payload into status, headers,
  * and body. Malformed input (bad version line, missing Content-Length,
  * truncated payload, missing record separator) refuses the WHOLE blob
  * with None — the repo's loud-drop rule: a silently-partial crawl file
  * would poison corpus statistics.
  *
  * Like the media decoders, ingestion is `binaryFile`-shaped: one
  * (id, bytes) row per archive file, decoded in batched mapPartitions —
  * map-only, scan-bound, no shuffle; at 100 TB the parallelism is the
  * file count and Spark's split planning, exactly like the reference's
  * text loaders.
  */
object Warc {

  /** One parsed record: `httpStatus`/`contentType`/`body` are filled
    * for `response` records (status -1 and empty body otherwise). */
  final case class WarcRecord(recIdx: Int, warcType: String,
                              targetUri: String, httpStatus: Int,
                              contentType: String, body: Array[Byte])

  private val Crlf = "\r\n"

  // ---- encoder (fixtures + round-trip tests) ------------------------------

  /** A complete HTTP response payload for a `response` record. */
  def httpResponse(status: Int, contentType: String,
                   body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 $status OK$Crlf" +
      s"Content-Type: $contentType$Crlf" +
      s"Content-Length: ${body.length}$Crlf$Crlf"
    head.getBytes("US-ASCII") ++ body
  }

  /** One spec-valid WARC record: version line, named headers, the
    * mandatory Content-Length, blank line, payload, record separator. */
  def record(warcType: String, targetUri: String,
             payload: Array[Byte]): Array[Byte] = {
    val uriLine =
      if (targetUri.isEmpty) "" else s"WARC-Target-URI: $targetUri$Crlf"
    val head = s"WARC/1.0$Crlf" +
      s"WARC-Type: $warcType$Crlf" +
      uriLine +
      s"WARC-Record-ID: <urn:uuid:fixture-${warcType.length}-${payload.length}>$Crlf" +
      s"Content-Length: ${payload.length}$Crlf$Crlf"
    head.getBytes("US-ASCII") ++ payload ++ (Crlf + Crlf).getBytes("US-ASCII")
  }

  /** Concatenate records into a plain WARC file. */
  def encode(records: Seq[Array[Byte]]): Array[Byte] =
    records.foldLeft(Array.emptyByteArray)(_ ++ _)

  /** The Common Crawl layout: each record its own gzip member,
    * members concatenated. */
  def encodeGz(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(r); gz.finish()
    }
    out.toByteArray
  }

  // ---- decoder -------------------------------------------------------------

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Inflate a (possibly multi-member) gzip stream; None on any
    * corruption — never a partial inflate. Strict member decode
    * ([[MemberGzipInputStream]]): a malformed subsequent member header
    * or trailing garbage is corruption, not EOF — java.util.zip would
    * silently truncate there, which on per-record-member archives means
    * a silently-partial record set. */
  private def gunzipAll(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new MemberGzipInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream(b.length * 4)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }

  /** All records of a WARC blob (plain or gzipped), or None if ANY
    * record is malformed. */
  def parse(bytes: Array[Byte]): Option[Seq[WarcRecord]] =
    parseOwned(bytes, _ => true)

  /** Malformed-archive signal of the STREAMING walk ([[streamRecords]]):
    * an IOException subtype so Spark task retry/failure semantics treat
    * it like any unreadable input. */
  final class WarcFormatException(label: String, reason: String)
      extends java.io.IOException(s"malformed WARC archive $label: $reason")

  /** Longest header line the streaming walk will buffer (64 KiB —
    * real WARC/HTTP headers are far smaller). Past it, the walk fails
    * loudly instead of accumulating the rest of a corrupt archive into
    * one StringBuilder, which would defeat the O(record) heap bound. */
  val MaxHeaderLine: Int = 1 << 16

  /** STREAMING record walk — the scale path of [[WarcDataSource]]: reads
    * `in` forward exactly once with O(record) peak heap. The byte-array
    * walk ([[parseOwned]]) holds the whole inflated archive on heap —
    * fatal for the multi-GB crawl files splitting exists for (and
    * impossible past 2 GiB, the array limit); here non-owned record
    * bodies are SKIPPED without materializing and owned bodies are the
    * only allocation.
    *
    * Gzip (possibly multi-member, the Common Crawl layout) is detected
    * from the magic bytes and decoded STRICTLY ([[MemberGzipInputStream]]):
    * per-member CRC verified, and a malformed subsequent member or
    * trailing garbage throws instead of reading as clean EOF (the
    * java.util.zip silent-truncation trap — a crawl archive corrupted at
    * a member boundary would otherwise commit a partial record set).
    * Malformation throws [[WarcFormatException]] at the offending record —
    * earlier records may already be consumed; the TASK still fails
    * loudly, so no silently-partial archive ever commits (the same
    * contract as parseOwned's all-or-nothing None, enforced at task level
    * instead of blob level). The stream closes on exhaustion and on
    * malformation; abandoning the iterator early (e.g. LIMIT) leaves
    * closing to the caller.
    *
    * `startIdx` offsets record indexes — the member-indexed range-slice
    * path starts mid-archive and passes the slice's first global index.
    * `onRecordStart(bytePos, idx)`, when non-null, fires before each
    * record parses with the record's INFLATED (plain: absolute) start
    * offset — the hook [[buildCutIndex]] uses, so index building and row
    * production share this one parser. */
  def streamRecords(raw: java.io.InputStream, owns: Int => Boolean,
                    label: String = "warc", startIdx: Int = 0,
                    onRecordStart: (Long, Int) => Unit = null): Iterator[WarcRecord] = {
    val pb = new java.io.PushbackInputStream(raw, 2)
    val h1 = pb.read(); val h2 = pb.read()
    if (h2 >= 0) pb.unread(h2)
    if (h1 >= 0) pb.unread(h1)
    val in: java.io.InputStream =
      if (h1 == 0x1f && h2 == 0x8b) new MemberGzipInputStream(pb)
      else pb
    def closeAll(): Unit = {
      try in.close() catch { case _: java.io.IOException => }
      try pb.close() catch { case _: java.io.IOException => }
    }

    def fail(reason: String): Nothing = {
      closeAll()
      throw new WarcFormatException(label, reason)
    }

    // buffered position-tracked reader over the (inflated) stream: `pos`
    // is the offset of the next unread byte in record-walk coordinates
    val buf = new Array[Byte](1 << 16)
    var bufPos = 0
    var bufLen = 0
    var pos = 0L
    def readByte(): Int = {
      if (bufPos >= bufLen) {
        bufLen = try in.read(buf, 0, buf.length) catch {
          case e: java.io.IOException if !e.isInstanceOf[WarcFormatException] =>
            fail(e.getMessage)
        }
        bufPos = 0
        if (bufLen < 0) { bufLen = 0; return -1 }
      }
      val b = buf(bufPos) & 0xff; bufPos += 1; pos += 1; b
    }
    // one CRLF-terminated US-ASCII line (the terminator is consumed and
    // stripped); EOF mid-line, bare LF, or an uncapped run without LF is
    // malformed. Bytes ≥ 0x80 decode to U+FFFD — exactly what the
    // byte-array walk's US-ASCII decoder yields, so both walks render a
    // non-ASCII WARC-Target-URI identically.
    def line(): String = {
      val sb = new java.lang.StringBuilder(64)
      var c = readByte()
      while (c >= 0 && c != '\n') {
        if (sb.length() >= MaxHeaderLine)
          fail(s"header line exceeds $MaxHeaderLine bytes")
        sb.append(if (c < 0x80) c.toChar else '�')
        c = readByte()
      }
      if (c < 0) fail("EOF inside a header line")
      val len = sb.length()
      if (len == 0 || sb.charAt(len - 1) != '\r')
        fail("header line not CRLF-terminated")
      sb.setLength(len - 1)
      sb.toString
    }
    def readFully(n: Long): Array[Byte] = {
      if (n > Int.MaxValue - 8) fail(s"record payload of $n bytes exceeds " +
        "the single-record limit (2 GiB) — not a valid WARC Content-Length")
      val out = new Array[Byte](n.toInt)
      var off = 0
      // drain the walk buffer first, then bulk-read
      val fromBuf = math.min(out.length, bufLen - bufPos)
      if (fromBuf > 0) {
        System.arraycopy(buf, bufPos, out, 0, fromBuf)
        bufPos += fromBuf; off = fromBuf
      }
      while (off < out.length) {
        val r = try in.read(out, off, out.length - off) catch {
          case e: java.io.IOException if !e.isInstanceOf[WarcFormatException] =>
            fail(e.getMessage)
        }
        if (r < 0) fail("EOF inside a record payload")
        off += r
      }
      pos += out.length
      out
    }
    def skipFully(n: Long): Unit = {
      var left = n
      val fromBuf = math.min(left, (bufLen - bufPos).toLong)
      bufPos += fromBuf.toInt; left -= fromBuf
      while (left > 0) {
        val s = try in.skip(left) catch {
          case e: java.io.IOException if !e.isInstanceOf[WarcFormatException] =>
            fail(e.getMessage)
        }
        if (s > 0) left -= s
        else if (in.read() >= 0) left -= 1 // skip() can return 0 mid-stream
        else fail("EOF inside a record payload")
      }
      pos += n
    }

    new Iterator[WarcRecord] {
      private var idx = startIdx
      private var nextRec: WarcRecord = _
      private var done = false

      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && !done) {
          val recStart = pos
          val first = readByte()
          if (first < 0) { done = true; closeAll() }
          else {
            if (onRecordStart != null) onRecordStart(recStart, idx)
            // re-join the already-consumed first byte to the version line
            val restOfVersion = line()
            val ver = (if (first < 0x80) first.toChar else '�') + restOfVersion
            if (ver != "WARC/1.0" && ver != "WARC/1.1")
              fail(s"bad version line '$ver'")
            var warcType = ""; var uri = ""; var contentLength = -1L
            var headersDone = false
            while (!headersDone) {
              val l = line()
              if (l.isEmpty) headersDone = true
              else {
                val colon = l.indexOf(':')
                if (colon < 0) fail(s"header line without colon: '$l'")
                val name = l.substring(0, colon).trim.toLowerCase
                val value = l.substring(colon + 1).trim
                name match {
                  case "warc-type" => warcType = value
                  case "warc-target-uri" => uri = value
                  case "content-length" =>
                    contentLength = try value.toLong catch {
                      case _: NumberFormatException =>
                        fail(s"bad Content-Length '$value'")
                    }
                  case _ => // WARC-Date, WARC-Record-ID, …: not needed
                }
              }
            }
            if (contentLength < 0) fail("missing Content-Length")
            if (warcType.isEmpty) fail("missing WARC-Type")
            val owned = owns(idx)
            val payload =
              if (owned) readFully(contentLength)
              else { skipFully(contentLength); Array.emptyByteArray }
            val sep = readFully(4)
            if (!(sep(0) == '\r' && sep(1) == '\n' &&
                  sep(2) == '\r' && sep(3) == '\n'))
              fail("missing record separator (two CRLF)")
            if (owned) {
              var status = -1; var cType = ""; var body = Array.emptyByteArray
              if (warcType == "response") {
                val s = indexOfDoubleCrlf(payload)
                if (s < 0) fail(s"response record $idx without HTTP header split")
                val head = new String(payload, 0, s, "US-ASCII")
                val lines = head.split(Crlf)
                val parts = lines.head.split(" ")
                if (parts.length < 2 || !parts(0).startsWith("HTTP/"))
                  fail(s"response record $idx with bad status line")
                status = try parts(1).toInt catch {
                  case _: NumberFormatException =>
                    fail(s"response record $idx with non-numeric status")
                }
                cType = lines.tail.collectFirst {
                  case l if l.toLowerCase.startsWith("content-type:") =>
                    l.substring(13).trim
                }.getOrElse("")
                body = java.util.Arrays.copyOfRange(payload, s + 4, payload.length)
              }
              nextRec = WarcRecord(idx, warcType, uri, status, cType, body)
            }
            idx += 1
          }
        }
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException("warc iterator")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  // ---- member-indexed split support ---------------------------------------

  /** A safe split point of an archive: byte offset `offset` (compressed
    * coordinates for .gz files) starts BOTH a gzip member AND record
    * number `recIdx` — a range slice beginning here decodes cleanly and
    * knows its records' global indexes without touching earlier bytes. */
  final case class CutPoint(offset: Long, recIdx: Int)

  /** Safe split points of one archive (see [[CutPoint]]) plus its total
    * record count. Bounded driver metadata: one entry per `minGap` of
    * compressed bytes at most. */
  final case class CutIndex(cuts: IndexedSeq[CutPoint], records: Int)

  /** One-pass cut-point index of an archive — the planning side of
    * member-indexed split reads ([[WarcDataSource]]). Walks the archive
    * once (O(record) heap, O(size/minGap) index entries) recording the
    * offsets where a slice may safely begin:
    *
    *  - per-record-gzip archives (the Common Crawl convention): every
    *    gzip member whose first inflated byte starts a record — member
    *    boundaries are found EXACTLY during the strict member walk
    *    ([[MemberGzipInputStream]]), never by scanning for magic bytes
    *    (which false-positive inside compressed data);
    *  - plain archives: record start offsets directly.
    *
    * `minGap` thins the index: cuts closer than `minGap` compressed
    * bytes to the previous kept cut are dropped (slices target 100+ MiB;
    * per-record granularity would bloat the driver index on million-
    * record archives). A monolithic single-member gzip archive yields
    * only the (0,0) cut — correctly unsplittable by ranges.
    *
    * The walk shares [[streamRecords]]' parser (structure-only pass:
    * `owns` rejects everything, so no payload materializes), so a cut
    * index exists iff the row path can read the archive; malformation
    * throws the same [[WarcFormatException]]. Does not close `raw` —
    * enforced by a close-shielding wrapper, since the plain-archive walk
    * closes its own stream stack on exhaustion (the gzip walk's
    * [[MemberGzipInputStream]] only releases its Inflater). */
  def buildCutIndex(raw: java.io.InputStream, label: String = "warc",
                    minGap: Long = 1L << 20): CutIndex = {
    val shielded = new java.io.FilterInputStream(raw) {
      override def close(): Unit = () // caller owns raw's lifecycle
    }
    var out: CutIndex = null
    val it = streamRecordsIndexed(shielded, _ => false, label, minGap,
      idx => out = idx)
    while (it.hasNext) it.next()
    out
  }

  /** [[streamRecords]] that ALSO builds the archive's [[CutIndex]] as a
    * side effect of the walk — the piggyback path: a round-robin
    * fallback read is already paying the full decompression walk, so
    * slice 0 can leave a sidecar index behind for free and the NEXT
    * scan plans member-indexed byte ranges ([[WarcDataSource]] wires
    * this under `split_mode=roundrobin` + `index_sidecar=write`).
    * `onIndex` fires exactly once, at CLEAN EXHAUSTION of the walk
    * (never on malformation, never on an abandoned iterator), so a
    * partial walk can never persist a partial index. Cut semantics,
    * thinning, and the shared parser are [[buildCutIndex]]'s — that
    * function IS this one with an owns-nothing walk. Closes the stream
    * on exhaustion/malformation like streamRecords. */
  def streamRecordsIndexed(raw: java.io.InputStream, owns: Int => Boolean,
                           label: String = "warc", minGap: Long = 1L << 20,
                           onIndex: CutIndex => Unit): Iterator[WarcRecord] = {
    // gzip detect must happen HERE (not inside streamRecords) so the
    // member callback can be attached; plain streams pass through with
    // identity coordinates (member start == record start trivially).
    val pb = new java.io.PushbackInputStream(raw, 2)
    val h1 = pb.read(); val h2 = pb.read()
    if (h2 >= 0) pb.unread(h2)
    if (h1 >= 0) pb.unread(h1)
    val cuts = IndexedSeq.newBuilder[CutPoint]
    var lastKept = Long.MinValue
    var records = 0
    val base: Iterator[WarcRecord] =
      if (h1 == 0x1f && h2 == 0x8b) {
        // members recorded as (compressedStart, inflatedStart), appended by
        // the decoder BEFORE any byte of the member is served — so when the
        // walker sees a record start at inflated offset R, a member
        // starting at R is already present. `mi` advances monotonically:
        // one linear merge of the two offset streams.
        val members = collection.mutable.ArrayBuffer[(Long, Long)]()
        val gz = new MemberGzipInputStream(pb, (c, i) => {
          // thin at member level too: an archive of tiny members must not
          // accumulate an unbounded driver-side list
          if (members.isEmpty || c - members.last._1 >= minGap) members += ((c, i))
        })
        var mi = 0
        streamRecords(gz, owns, label,
          onRecordStart = (r, idx) => {
            records = idx + 1
            while (mi < members.length && members(mi)._2 < r) mi += 1
            if (mi < members.length && members(mi)._2 == r &&
                (lastKept == Long.MinValue || members(mi)._1 - lastKept >= minGap)) {
              cuts += CutPoint(members(mi)._1, idx)
              lastKept = members(mi)._1
            }
          })
      } else {
        streamRecords(pb, owns, label,
          onRecordStart = (r, idx) => {
            records = idx + 1
            if (lastKept == Long.MinValue || r - lastKept >= minGap) {
              cuts += CutPoint(r, idx)
              lastKept = r
            }
          })
      }
    new Iterator[WarcRecord] {
      private var fired = false
      override def hasNext: Boolean = {
        val h = base.hasNext
        if (!h && !fired) { // clean exhaustion: the whole walk completed
          fired = true
          onIndex(CutIndex(cuts.result(), records))
        }
        h
      }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException("warc iterator")
        base.next()
      }
    }
  }

  /** One-pass re-materialization of ANY readable archive (plain, or gzip
    * of any member layout — including the monolithic single-member form
    * that defeats range splitting) into the per-record-member gzip
    * layout (the Common Crawl convention): each record becomes its own
    * gzip member, so the output indexes into byte-range slices forever
    * after. Records pass through BYTE-VERBATIM — every header line
    * (WARC-Date, WARC-Record-ID, extension headers the row parser
    * ignores) is copied untouched, so `parse(transcoded) ==
    * parse(original)` record for record. O(64 KiB) peak heap (payloads
    * stream through in chunks); malformation throws
    * [[WarcFormatException]] at the offending record, same as every
    * other walk. Returns the record count. Closes neither stream —
    * callers own both lifecycles ([[WarcDataSource.rematerialize]] is
    * the path-based wrapper). */
  def transcodeToMemberGzip(raw: java.io.InputStream, out: java.io.OutputStream,
                            label: String = "warc"): Int = {
    val pb = new java.io.PushbackInputStream(raw, 2)
    val h1 = pb.read(); val h2 = pb.read()
    if (h2 >= 0) pb.unread(h2)
    if (h1 >= 0) pb.unread(h1)
    val in: java.io.InputStream =
      if (h1 == 0x1f && h2 == 0x8b) new MemberGzipInputStream(pb) else pb
    val bin = new java.io.BufferedInputStream(in, 1 << 16)
    def fail(reason: String): Nothing = throw new WarcFormatException(label, reason)
    val buf = new Array[Byte](1 << 16)
    var count = 0
    var eof = false
    while (!eof) {
      bin.mark(1)
      if (bin.read() < 0) eof = true
      else {
        bin.reset()
        // header block: capture bytes verbatim while extracting only what
        // the record frame needs (version sanity + Content-Length)
        val head = new java.io.ByteArrayOutputStream(512)
        var contentLength = -1L
        var version: String = null
        var headersDone = false
        while (!headersDone) {
          val lineBuf = new java.io.ByteArrayOutputStream(128)
          var c = bin.read()
          while (c >= 0 && c != '\n') {
            if (lineBuf.size >= MaxHeaderLine)
              fail(s"header line exceeds $MaxHeaderLine bytes")
            lineBuf.write(c); c = bin.read()
          }
          if (c < 0) fail("EOF inside a header line")
          lineBuf.write('\n')
          val lb = lineBuf.toByteArray
          if (lb.length < 2 || lb(lb.length - 2) != '\r')
            fail("header line not CRLF-terminated")
          head.write(lb, 0, lb.length)
          val s = new String(lb, 0, lb.length - 2, "US-ASCII")
          if (version == null) {
            version = s
            if (s != "WARC/1.0" && s != "WARC/1.1")
              fail(s"bad version line '$s'")
          } else if (s.isEmpty) headersDone = true
          else {
            val colon = s.indexOf(':')
            if (colon < 0) fail(s"header line without colon: '$s'")
            if (s.substring(0, colon).trim.equalsIgnoreCase("content-length"))
              contentLength =
                try s.substring(colon + 1).trim.toLong
                catch { case _: NumberFormatException =>
                  fail(s"bad Content-Length '${s.substring(colon + 1).trim}'") }
          }
        }
        if (contentLength < 0) fail("missing Content-Length")
        // one gzip member per record: header + streamed payload + separator
        val gz = new java.util.zip.GZIPOutputStream(out, 1 << 16)
        gz.write(head.toByteArray)
        var left = contentLength
        while (left > 0) {
          val n = bin.read(buf, 0, math.min(left, buf.length.toLong).toInt)
          if (n < 0) fail("EOF inside a record payload")
          gz.write(buf, 0, n); left -= n
        }
        val sep = new Array[Byte](4)
        var off = 0
        while (off < 4) {
          val n = bin.read(sep, off, 4 - off)
          if (n < 0) fail("EOF at record separator")
          off += n
        }
        if (!(sep(0) == '\r' && sep(1) == '\n' && sep(2) == '\r' && sep(3) == '\n'))
          fail("missing record separator (two CRLF)")
        gz.write(sep)
        gz.finish() // member boundary; `out` stays open for the next record
        count += 1
      }
    }
    count
  }

  /** [[parse]] restricted to the records whose index satisfies `owns` —
    * the split-read path of [[WarcDataSource]]. Non-owned records are
    * still STRUCTURALLY validated (version line, headers, declared
    * Content-Length, record separator) so the walk stays on record
    * boundaries and `recIdx` stays globally exact, but their payload is
    * neither copied nor HTTP-split nor charset-decoded — the dominant
    * per-record costs. Payload-level malformation of a non-owned
    * `response` record is caught by the split that owns it (every
    * record has exactly one owner across a split set). */
  def parseOwned(bytes: Array[Byte],
                 owns: Int => Boolean): Option[Seq[WarcRecord]] = {
    val b = if (isGzip(bytes)) gunzipAll(bytes).getOrElse(return None)
            else bytes
    val records = Seq.newBuilder[WarcRecord]
    var pos = 0
    var idx = 0
    def line(from: Int): Option[(String, Int)] = {
      var i = from
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
      if (i + 1 >= b.length) None
      else Some((new String(b, from, i - from, "US-ASCII"), i + 2))
    }
    while (pos < b.length) {
      // version line
      val (ver, afterVer) = line(pos).getOrElse(return None)
      if (ver != "WARC/1.0" && ver != "WARC/1.1") return None
      // named headers to the blank line
      var warcType = ""; var uri = ""; var contentLength = -1L
      var p = afterVer
      var headersDone = false
      while (!headersDone) {
        val (l, next) = line(p).getOrElse(return None)
        p = next
        if (l.isEmpty) headersDone = true
        else {
          val colon = l.indexOf(':')
          if (colon < 0) return None
          val name = l.substring(0, colon).trim.toLowerCase
          val value = l.substring(colon + 1).trim
          name match {
            case "warc-type" => warcType = value
            case "warc-target-uri" => uri = value
            case "content-length" =>
              contentLength = try value.toLong catch {
                case _: NumberFormatException => return None
              }
            case _ => // WARC-Date, WARC-Record-ID, …: carried, not needed
          }
        }
      }
      if (contentLength < 0 || warcType.isEmpty) return None
      if (p + contentLength + 4 > b.length) return None // payload + sep
      val owned = owns(idx)
      val payload =
        if (owned) java.util.Arrays.copyOfRange(b, p, (p + contentLength).toInt)
        else Array.emptyByteArray // non-owned: declared-length skip, no copy
      p = (p + contentLength).toInt
      // mandatory two-CRLF record separator
      if (!(b(p) == '\r' && b(p + 1) == '\n' &&
            b(p + 2) == '\r' && b(p + 3) == '\n')) return None
      pos = p + 4
      // HTTP split for response records
      var status = -1; var cType = ""; var body = Array.emptyByteArray
      if (owned && warcType == "response") {
        val sep = indexOfDoubleCrlf(payload)
        if (sep < 0) return None
        val head = new String(payload, 0, sep, "US-ASCII")
        val lines = head.split(Crlf)
        val parts = lines.head.split(" ")
        if (parts.length < 2 || !parts(0).startsWith("HTTP/")) return None
        status = try parts(1).toInt catch {
          case _: NumberFormatException => return None
        }
        cType = lines.tail.collectFirst {
          case l if l.toLowerCase.startsWith("content-type:") =>
            l.substring(13).trim
        }.getOrElse("")
        body = java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
      }
      if (owned) records += WarcRecord(idx, warcType, uri, status, cType, body)
      idx += 1
    }
    Some(records.result())
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  // ---- operators -----------------------------------------------------------

  private val CharsetRe =
    java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*[\"']?([\\w.:-]+)")

  /** Body bytes → UTF-8 text with real-crawl charset semantics: the
    * HTTP Content-Type `charset=` parameter wins; an HTML
    * `<meta ... charset=...>` in the first 1024 bytes (the HTML5
    * sniffing window) is the fallback; otherwise UTF-8. Unknown or
    * unsupported charset names fall back to UTF-8 rather than dropping
    * the page — a mislabeled charset yields replacement characters the
    * downstream language/quality filters catch, while a drop would
    * silently bias the corpus against older encodings. */
  def decodeBody(contentType: String, body: Array[Byte]): String = {
    def named(src: String): Option[java.nio.charset.Charset] = {
      val m = CharsetRe.matcher(src)
      if (!m.find()) None
      else try Some(java.nio.charset.Charset.forName(m.group(1)))
      catch { case _: Exception => None }
    }
    val cs = named(contentType).orElse {
      val head = new String(body, 0, math.min(1024, body.length),
        java.nio.charset.StandardCharsets.ISO_8859_1) // byte-transparent
      named(head)
    }.getOrElse(java.nio.charset.StandardCharsets.UTF_8)
    new String(body, cs)
  }

  /** HTTP `response` records of each archive as rows: (id, rec_idx,
    * target_uri, http_status, content_type, body_text) — batched
    * mapPartitions decode, map-only; an undecodable archive contributes
    * no rows (loud drop at the frame level: parse is all-or-nothing per
    * blob). Body bytes decode via [[decodeBody]]'s charset rules and
    * land as UTF-8 text — crawl curation is text-first; binary payloads
    * survive as replacement-char text for the downstream
    * language/quality filters to drop. */
  def extractResponses(archives: Dataset[Media.MediaRecord]): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.mapPartitions(_.flatMap { rec =>
      parse(rec.bytes).toSeq.flatten.collect {
        case r if r.warcType == "response" =>
          (rec.id, r.recIdx, r.targetUri, r.httpStatus, r.contentType,
            decodeBody(r.contentType, r.body))
      }
    }).toDF("id", "rec_idx", "target_uri", "http_status", "content_type",
      "body_text")
  }
}
