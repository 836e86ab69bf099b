package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for WARC web archives —
  * `spark.read.format("warc").load(dir)` — the engine-native form of
  * [[Warc.extractResponses]] (which needs the archive bytes pre-loaded
  * into a binary column). Spark-first mechanics, not a wrapper:
  *
  *  - PLANNING ([[WarcScan.planInputPartitions]]): size-balanced task
  *    grain, both directions. A file larger than `split_size` (option,
  *    default 128 MiB) fans out into ceil(size/target) SPLITS; files
  *    and splits then bin-pack into partitions up to the same target,
  *    so a directory of tiny shards doesn't become thousands of
  *    one-file tasks (the same two moves Spark's own FilePartition
  *    planner makes). The driver lists the directory once — bounded
  *    metadata, no data read.
  *  - SPLIT SEMANTICS (`split_mode=index`, the default): oversized
  *    files get a MEMBER CUT INDEX first — one linear walk per file (a
  *    plan-time Spark job, cached for the JVM lifetime) recording the
  *    byte offsets where a gzip member and a record start together
  *    (plain files: record offsets). Splits are then BYTE RANGES on cut
  *    boundaries: each slice seeks to its offset and inflates only its
  *    own window, so an N-way split of one archive costs ~1× total
  *    inflate (2× on the first, index-building read) instead of the N
  *    full decompression walks the round-robin form pays. Per-record
  *    gzip (the Common Crawl layout) cuts at every `indexMinGap`;
  *    a monolithic single-member gzip archive has no interior cut and
  *    falls back to ROUND-ROBIN ownership (split k of n owns records
  *    with idx % n == k; every split walks the whole structure but
  *    materializes only owned records) — also selectable outright with
  *    `split_mode=roundrobin`. In both forms `rec_idx` stays globally
  *    exact and each record has exactly one owner, so a split union is
  *    bit-identical to an unsplit read.
  *  - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): the reader
  *    materializes ONLY requested columns; a `count()` or a
  *    uri-only projection never allocates body strings (the dominant
  *    cost — bodies are the archive).
  *  - FILTER PUSHDOWN ([[SupportsPushDownFilters]]): `warc_type = X`
  *    equalities are evaluated during the record walk, so request/
  *    metadata records are dropped before any HTTP split or row
  *    assembly; accepted filters are reported as pushed so Catalyst
  *    drops their residuals. Multiple equalities INTERSECT (a
  *    conjunction of two different values is the empty scan), never
  *    first-one-wins.
  *
  *  - DEPLOYMENT RECIPE for an unindexed crawl bucket: set
  *    `index_sidecar=write` on FIRST CONTACT — every built index
  *    persists as a dot-prefixed sidecar next to its archive (mtime+size
  *    staleness-keyed, footer-validated), so the bucket is indexed once
  *    and read forever; later scans (default `index_sidecar=read`) probe
  *    sidecars in parallel tasks and never re-walk. If even the first
  *    scan's plan-time index job is too serial (one task per cold
  *    archive — a single 100 GiB archive walks on one core), run the
  *    first scan as `split_mode=roundrobin` + `index_sidecar=write`:
  *    slice 0 of each oversized archive PIGGYBACKS index construction on
  *    the read it is doing anyway and leaves the sidecar behind, so no
  *    scan ever pays a dedicated index pass.
  *
  * Parse semantics are [[Warc.streamRecords]]'s: a malformed archive
  * THROWS at the offending record (fail-fast task error, including the
  * strict gzip member checks), so no silently-partial archive ever
  * commits rows; crawl jobs that prefer drop-and-continue per archive
  * use the operator form ([[Warc.extractResponses]], all-or-nothing
  * None per blob).
  *
  * COMPATIBILITY (strict member gzip, r11+): archives with trailing
  * garbage or zero-padding after the last gzip member — which
  * `java.util.zip` (and this source before r11) silently accepted as
  * EOF — now fail the read loudly. That strictness is the point (a
  * member-boundary corruption would otherwise commit a partial record
  * set), but a previously-readable padded `.gz` file now errors: route
  * such files through the drop-and-continue operator form
  * ([[Warc.extractResponses]]) or strip the padding. */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WarcTable(properties.get("path"))
}

object WarcDataSource {
  /** Full table schema; `rec_idx` is the record's position within its
    * archive (warcinfo/request records count — response indexes are
    * stable regardless of what the filter pushes down or how the file
    * splits). */
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("rec_idx", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = false),
    StructField("http_status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("body_text", StringType, nullable = false)))

  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  /** One work unit of a scan task. */
  sealed trait Slice { def file: String }

  /** Round-robin split `splitIdx` of `numSplits` over `file` (1-of-1 =
    * the whole file): every split walks the whole archive structure and
    * owns records with idx % numSplits == splitIdx. The LEGACY split
    * form — still used for whole-file reads, for `split_mode=roundrobin`,
    * and as the fallback when an archive has no interior cut points
    * (monolithic single-member gzip). */
  final case class FileSlice(file: String, splitIdx: Int, numSplits: Int)
      extends Slice

  /** Member-indexed byte-range split: records of `file` beginning in
    * [startOffset, endOffset) — both offsets are cut points from the
    * file's [[Warc.CutIndex]] (a gzip-member start that is also a record
    * start), so the slice SEEKS to startOffset, inflates only its own
    * range, and knows its first record's global index without touching
    * any earlier byte. N slices of one archive cost ~1× total inflate,
    * where N round-robin splits cost N× — the difference between O(size)
    * and O(size²/splitSize) total work on a multi-GB crawl archive. */
  final case class RangeSlice(file: String, startOffset: Long,
                              endOffset: Long, firstRecIdx: Int)
      extends Slice

  private def sliceOrder(s: Slice): (String, Long) = s match {
    case FileSlice(f, k, _) => (f, k.toLong)
    case RangeSlice(f, o, _, _) => (f, o)
  }

  /** First-fit-descending bin pack of (slice, cost) into bins of
    * `target` — same shape as Spark's FilePartition packing.
    * Deterministic: order depends only on names, sizes, and offsets. */
  private def pack(slices: Seq[(Slice, Long)], target: Long): Seq[Seq[Slice]] = {
    val bins = collection.mutable.ArrayBuffer[(collection.mutable.ArrayBuffer[Slice], Long)]()
    slices.sortBy { case (sl, cost) =>
      val (f, k) = sliceOrder(sl); (-cost, f, k)
    }.foreach { case (sl, cost) =>
      bins.indexWhere(_._2 + cost <= target) match {
        case -1 => bins += ((collection.mutable.ArrayBuffer(sl), cost))
        case i => bins(i) = (bins(i)._1 += sl, bins(i)._2 + cost)
      }
    }
    bins.map(_._1.toSeq).toSeq
  }

  /** Plan (file, size) pairs into partitions: big files fan out into
    * round-robin splits, then slices bin-pack up to `target` bytes.
    * The index-free legacy planner (`split_mode=roundrobin`); the
    * default path is [[planSlicesIndexed]]. */
  def planSlices(files: Seq[(String, Long)], target: Long): Seq[Seq[FileSlice]] = {
    require(target > 0, s"warc split_size must be positive, got $target")
    val slices = files.sortBy(_._1).flatMap { case (f, size) =>
      val n = math.max(1L, (size + target - 1) / target).toInt
      (0 until n).map(k => (FileSlice(f, k, n): Slice, size / n))
    }
    pack(slices, target).map(_.map(_.asInstanceOf[FileSlice]))
  }

  /** Cut-index granularity for a given slice target: cuts closer than
    * this are thinned at index-build time (bounded driver metadata) —
    * fine enough that slices land within ~1/16 of the target, capped at
    * 1 MiB so the default 128 MiB target doesn't index every record. */
  def indexMinGap(target: Long): Long =
    math.max(1L, math.min(1L << 20, target / 16))

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.sources.WarcDataSource")

  /** The default `onFallback` of [[planSlicesIndexed]]: one WARN line per
    * oversized file taking the N-walk round-robin fallback, naming the
    * cost and the way out — an indexed-but-cutless file is a monolithic
    * single-member gzip (re-materialize it, [[rematerialize]]); an
    * unindexed one is a `split_mode=roundrobin` plan (switch to `index`,
    * with `index_sidecar=write` on first contact). Without this line a
    * user pointing the source at a single-member 50 GiB archive silently
    * pays O(size²/splitSize) total inflate on every scan. */
  private[graft] def logFallbackWarning(file: String, size: Long, n: Int,
                                        indexed: Boolean): Unit =
    log.warn(
      if (indexed)
        s"warc: $file ($size bytes) has no interior member cut point " +
          s"(monolithic single-member gzip) — splitting into $n round-robin " +
          s"walks, each a FULL decompression of the archive (~${n}x total " +
          "inflate, every scan). Re-materialize it into per-record gzip " +
          "members (WarcDataSource.rematerialize / Warc.transcodeToMemberGzip) " +
          "to make it range-splittable."
      else
        s"warc: $file ($size bytes) splits into $n round-robin walks, each " +
          s"a FULL decompression of the archive (~${n}x total inflate). Use " +
          "split_mode=index (with index_sidecar=write on first contact) for " +
          "seek-and-read byte-range splits.")

  /** Plan with member indexes where available: an indexed file with ≥2
    * cut points splits into byte-range slices on cut boundaries
    * ([[RangeSlice]]); anything else (no index, or no interior cut —
    * monolithic gzip) falls back to [[planSlices]]' round-robin form.
    * Either way slices bin-pack into `target`-sized partitions, and the
    * union of any plan's slices is bit-identical to the unsplit read.
    * `onFallback(file, size, nSplits, hadIndex)` fires once per
    * oversized file that takes the round-robin fallback (default: a
    * WARN log naming the N×-inflate cost — [[logFallbackWarning]]). */
  def planSlicesIndexed(files: Seq[(String, Long)], target: Long,
                        indexes: Map[String, Warc.CutIndex],
                        onFallback: (String, Long, Int, Boolean) => Unit =
                          logFallbackWarning): Seq[Seq[Slice]] = {
    require(target > 0, s"warc split_size must be positive, got $target")
    val slices = files.sortBy(_._1).flatMap { case (f, size) =>
      indexes.get(f).filter(_.cuts.length >= 2) match {
        case Some(idx) if size > target =>
          val cuts = idx.cuts
          require(cuts.head.offset == 0L && cuts.head.recIdx == 0,
            s"cut index of $f must start at (0,0), got ${cuts.head}")
          val out = Seq.newBuilder[(Slice, Long)]
          var start = cuts.head
          cuts.tail.foreach { c =>
            if (c.offset - start.offset >= target) {
              out += ((RangeSlice(f, start.offset, c.offset, start.recIdx),
                c.offset - start.offset))
              start = c
            }
          }
          out += ((RangeSlice(f, start.offset, size, start.recIdx),
            size - start.offset))
          out.result()
        case _ =>
          val n = math.max(1L, (size + target - 1) / target).toInt
          if (n > 1) onFallback(f, size, n, indexes.contains(f))
          (0 until n).map(k => (FileSlice(f, k, n): Slice, size / n))
      }
    }
    pack(slices, target)
  }

  /** Re-materialize `src` (any readable archive — notably a MONOLITHIC
    * single-member gzip, which can never range-split) as `dst` in the
    * per-record-member gzip layout, through the same Hadoop FS layer the
    * scans use (object-store URIs work). One linear read, O(64 KiB)
    * heap, record-verbatim ([[Warc.transcodeToMemberGzip]]); the output
    * indexes into byte-range slices on every future scan. Returns the
    * record count; on failure the partial `dst` is deleted. */
  def rematerialize(src: String, dst: String,
                    conf: org.apache.hadoop.conf.Configuration): Int = {
    val in = open(src, conf)
    val dp = new org.apache.hadoop.fs.Path(dst)
    val fs = fsFor(dp, conf)
    val out = fs.create(dp, true)
    var ok = false
    try {
      val n = Warc.transcodeToMemberGzip(in, out, src)
      ok = true
      n
    } finally {
      try in.close() catch { case _: java.io.IOException => }
      try out.close() catch { case _: java.io.IOException => }
      if (!ok) { try fs.delete(dp, false) catch { case _: java.io.IOException => } }
    }
  }

  /** Distributed [[rematerialize]] of a whole archive directory — the
    * bucket-level migration: every file of `srcDir` transcodes to the
    * per-record-member gzip layout under `dstDir` (same base names,
    * `.gz` appended to non-`.gz` names), ONE Spark task per archive, so
    * a thousand-archive crawl bucket converts at cluster parallelism
    * (the per-file walk itself is inherently sequential — gzip). Output
    * names preserve the source's lexicographic ORDER (the streaming
    * source's arrival contract survives the migration). Returns
    * (file, records) per archive; any malformed archive fails its task
    * loudly — the job, like every read, never silently drops part of a
    * corpus. */
  def rematerializeDir(srcDir: String, dstDir: String): Seq[(String, Int)] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val files = listFiles(srcDir, conf.value.value)
    if (files.isEmpty) return Seq.empty
    val dp = new org.apache.hadoop.fs.Path(dstDir)
    fsFor(dp, conf.value.value).mkdirs(dp)
    spark.sparkContext.parallelize(files.map(_._1), files.size)
      .map { src =>
        val name = new org.apache.hadoop.fs.Path(src).getName
        val outName = if (name.endsWith(".gz")) name else s"$name.gz"
        val dst = new org.apache.hadoop.fs.Path(dstDir, outName).toString
        (src, rematerialize(src, dst, conf.value.value))
      }
      .collect().toSeq // bounded: one (path, count) pair per archive
  }

  /** Driver-side cut-index cache, keyed (path, size): index building
    * costs one linear walk of the archive, so repeated scans of the same
    * listing must not rebuild. Entries are bounded metadata
    * (≤ size/minGap cut points); keyed by size so an overwritten file
    * re-indexes (an in-place SAME-SIZE rewrite mid-session keeps the
    * stale entry — the cross-session sidecar carries an mtime check; the
    * in-JVM window shares Spark FileStatusCache's caveat). LRU-BOUNDED
    * at [[IndexCacheMaxFiles]] files so a long-running streaming driver
    * watching an ever-growing crawl directory cannot accrete heap
    * without bound. */
  private[graft] var IndexCacheMaxFiles = 1024 // var: spec shrinks it to drive eviction
  private[graft] val indexCache: java.util.Map[(String, Long), Warc.CutIndex] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Long), Warc.CutIndex](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Long), Warc.CutIndex]): Boolean =
          size() > IndexCacheMaxFiles
      })

  /** Sidecar index file of an archive: a dot-prefixed sibling — hidden
    * to [[listFiles]] (and to Spark's own FileIndex convention), so the
    * index never reads as an archive. */
  private[graft] def sidecarPath(file: String): org.apache.hadoop.fs.Path = {
    val p = new org.apache.hadoop.fs.Path(file)
    new org.apache.hadoop.fs.Path(p.getParent, s".${p.getName}.graftidx")
  }

  /** Persist a cut index next to its archive (the CDX-shaped move: crawl
    * deployments index once, read forever). Text format: a header
    * carrying the archive's size AND mtime (both staleness-key the
    * sidecar against replacement — including the in-place same-size
    * rewrite a size-only check misses), one line per cut, and a
    * trailing `end <cutCount>` footer so a truncated write can never
    * parse as a complete (wrong) index. Written to a temp sibling then
    * RENAMED — readers race against whole files, not partial writes.
    * The temp name carries a per-writer UUID so two concurrent scans of
    * the same directory (e.g. under different split_size, hence
    * different cut granularity) can never interleave writes into one
    * temp file and rename mixed content into place. */
  private[graft] def writeSidecar(file: String, size: Long, idx: Warc.CutIndex,
                                  conf: org.apache.hadoop.conf.Configuration): Unit = {
    val sp = sidecarPath(file)
    val fs = fsFor(sp, conf)
    val mtime = fs.getFileStatus(new org.apache.hadoop.fs.Path(file))
      .getModificationTime
    val tmp = new org.apache.hadoop.fs.Path(sp.getParent,
      s"${sp.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try {
      val sb = new java.lang.StringBuilder(48 + idx.cuts.length * 16)
      sb.append("graftwarcidx v2 ").append(size).append(' ').append(mtime)
        .append(' ').append(idx.records).append('\n')
      idx.cuts.foreach(c =>
        sb.append(c.offset).append(' ').append(c.recIdx).append('\n'))
      sb.append("end ").append(idx.cuts.length).append('\n')
      out.write(sb.toString.getBytes("US-ASCII"))
    } finally out.close()
    if (!fs.rename(tmp, sp)) { // e.g. target locked: replace explicitly
      fs.delete(sp, false)
      if (!fs.rename(tmp, sp)) fs.delete(tmp, false)
    }
  }

  /** Load a sidecar index if present, readable, version-matched, fresh
    * (stored size AND archive mtime match), complete (footer cut count
    * matches), and structurally sound (cuts start at (0,0) and are
    * strictly increasing in both coordinates); None otherwise — a
    * stale, truncated, or corrupt sidecar silently degrades to a
    * rebuild, never a wrong plan. */
  private[graft] def readSidecar(file: String, size: Long,
                                 conf: org.apache.hadoop.conf.Configuration): Option[Warc.CutIndex] =
    try {
      val sp = sidecarPath(file)
      val fs = fsFor(sp, conf)
      if (!fs.exists(sp)) return None
      val in = fs.open(sp)
      val lines =
        try scala.io.Source.fromInputStream(in, "US-ASCII").getLines().toArray
        finally in.close()
      val head = lines.head.split(' ')
      if (head.length != 5 || head(0) != "graftwarcidx" || head(1) != "v2" ||
          head(2).toLong != size) return None
      val mtime = fs.getFileStatus(new org.apache.hadoop.fs.Path(file))
        .getModificationTime
      if (head(3).toLong != mtime) return None
      val foot = lines.last.split(' ')
      if (foot.length != 2 || foot(0) != "end") return None
      val body = lines.slice(1, lines.length - 1).filter(_.nonEmpty)
      if (body.length != foot(1).toInt) return None
      val cuts = body.map { l =>
        val sep = l.indexOf(' ')
        Warc.CutPoint(l.substring(0, sep).toLong, l.substring(sep + 1).toInt)
      }
      val sound = cuts.nonEmpty && cuts.head == Warc.CutPoint(0L, 0) &&
        cuts.sliding(2).forall {
          case Array(a, b) => a.offset < b.offset && a.recIdx < b.recIdx
          case _ => true
        }
      if (!sound) return None
      Some(Warc.CutIndex(cuts.toIndexedSeq, head(4).toInt))
    } catch { case _: Exception => None }

  /** Cut indexes for `files`: the JVM cache first, then ONE Spark job
    * for whatever is missing — each task probes the file's SIDECAR
    * first (`sidecar` = "read"/"write"; "off" skips the probe) and only
    * walks the archive when none is usable, persisting afterwards under
    * "write" (best-effort — a read-only source dir must not fail the
    * read). Probing inside the job keeps the driver to one collect: a
    * first scan over thousands of object-store archives pays its
    * sidecar GETs in parallel tasks, never as serial driver round
    * trips. A sidecar built under a different split_size carries its
    * own cut granularity — [[planSlicesIndexed]]'s greedy merge
    * respects the CURRENT target either way (finer cuts merge up;
    * coarser cuts mean slices land on the coarser boundaries). */
  private[graft] def indexesFor(files: Seq[(String, Long)], minGap: Long,
      conf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration],
      sidecar: String = "read"): Map[String, Warc.CutIndex] = {
    // take cache hits FIRST, then return hits ++ built directly: a
    // listing wider than the LRU bound must still plan every file with
    // its freshly-built index this scan (re-reading through the cache
    // after the puts would lose early entries to eviction and silently
    // degrade those files to the round-robin fallback — the exact
    // crawl-bucket scale the index targets)
    val hits = files.flatMap { case (f, s) =>
      Option(indexCache.get((f, s))).map(f -> _)
    }
    val hitNames = hits.iterator.map(_._1).toSet
    val missing = files.filterNot(f => hitNames(f._1))
    val built: Array[((String, Long), Warc.CutIndex)] = if (missing.isEmpty) {
      Array.empty
    } else {
      val sc = org.apache.spark.sql.SparkSession.active.sparkContext
      val probeSidecar = sidecar != "off"
      val persist = sidecar == "write"
      val out = sc.parallelize(missing, missing.size)
        .map { case (f, size) =>
          val c = conf.value.value
          val idx = (if (probeSidecar) readSidecar(f, size, c) else None)
            .getOrElse {
              val in = open(f, c)
              val fresh =
                try Warc.buildCutIndex(in, f, minGap)
                finally { try in.close() catch { case _: java.io.IOException => } }
              if (persist) {
                try writeSidecar(f, size, fresh, c)
                catch { case _: java.io.IOException => } // read-only dir: skip
              }
              fresh
            }
          ((f, size), idx)
        }.collect()
      out.foreach { case (k, v) => indexCache.put(k, v) }
      out
    }
    (hits ++ built.map { case ((f, _), idx) => f -> idx }).toMap
  }

  /** The record iterator of one slice over an already-open positioned
    * stream — shared by the partition reader and the split-cost specs,
    * so what the tests measure IS the production read path. Round-robin
    * slices walk from the stream's current position (0); range slices
    * seek to their cut offset and read a bounded window. */
  private[graft] def sliceRecords(sl: Slice,
      in: java.io.InputStream with org.apache.hadoop.fs.Seekable,
      minGap: Long = 1L << 20,
      onIndex: Warc.CutIndex => Unit = null): Iterator[Warc.WarcRecord] =
    sl match {
      case FileSlice(f, splitIdx, numSplits) =>
        val owns: Int => Boolean =
          if (numSplits == 1) _ => true
          else idx => idx % numSplits == splitIdx
        // piggyback: a full-structure walk can build the cut index for
        // free — onIndex fires only on clean exhaustion, so an abandoned
        // or failed walk never yields a (partial) index
        if (onIndex != null) Warc.streamRecordsIndexed(in, owns, f, minGap, onIndex)
        else Warc.streamRecords(in, owns, f)
      case RangeSlice(f, start, end, firstRec) =>
        in.seek(start)
        Warc.streamRecords(new BoundedInputStream(in, end - start),
          _ => true, s"$f[$start,$end)", startIdx = firstRec)
    }

  /** The path's FileSystem, with local paths unwrapped to the RAW local
    * FS: `LocalFileSystem` is a ChecksumFileSystem, and its per-open
    * probe for a sibling `.crc` file doubles syscalls on the
    * many-tiny-archives shape (the WARC stream's batch grain) for
    * checksums WARC archives never carry. */
  private[graft] def fsFor(p: org.apache.hadoop.fs.Path,
                    conf: org.apache.hadoop.conf.Configuration): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(conf) match {
      case l: org.apache.hadoop.fs.LocalFileSystem => l.getRaw
      case other => other
    }

  /** List `path` (one file or a directory) through the Hadoop FileSystem
    * API — the same layer the parquet scans use, so `s3a://`/`abfs://`/
    * `hdfs://` crawl buckets work exactly like local directories (the
    * pre-r10 lister was `java.io.File`-only). Hidden files (`.`/`_`
    * prefixes) are skipped like Spark's own FileIndex. Returns
    * name-sorted (path, size); when the USER's path carried no scheme,
    * listed names are rendered schemeless too, so output `path` column
    * values and committed stream offsets are byte-identical to the old
    * lister's (and re-resolve through the same default FS on open). */
  private[graft] def listFiles(path: String,
                               conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long)] = {
    val hadScheme = path.matches("[A-Za-z][A-Za-z0-9+.-]*:.*")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = fsFor(p, conf)
    val st =
      try fs.getFileStatus(p)
      catch { case _: java.io.FileNotFoundException => return Seq.empty }
    val stats = if (st.isFile) Array(st) else fs.listStatus(p).filter(_.isFile)
    stats
      .filter { s =>
        val n = s.getPath.getName
        !n.startsWith(".") && !n.startsWith("_")
      }
      .map { s =>
        val name =
          if (hadScheme) s.getPath.toString else s.getPath.toUri.getPath
        (name, s.getLen)
      }
      .sortBy(_._1).toSeq
  }

  /** Open a listed file for the streaming record walk (executor side).
    * FSDataInputStream: seekable, so range slices position directly. */
  private[graft] def open(file: String,
                          conf: org.apache.hadoop.conf.Configuration): org.apache.hadoop.fs.FSDataInputStream = {
    val p = new org.apache.hadoop.fs.Path(file)
    fsFor(p, conf).open(p)
  }

  /** The streaming batch a (start, end] offset pair selects from the
    * current sorted listing. Offsets are (index, lastName); lastName ""
    * marks a legacy r8 bare-int checkpoint. Name intervals are the
    * primary boundary (immune to listing races — a transiently-missed
    * file heals into its interval); a legacy START falls back to the
    * index slice, and a legacy END (crash-replayed pending batch whose
    * offset-WAL predates the name format) must ALSO bound by its index —
    * its empty name passes every file, including ones that arrived after
    * the recorded end, which the next batch (starting at that same end)
    * would then re-plan as duplicates. */
  private[graft] def selectBatch(files: Seq[String],
                                   startN: Int, startLast: String,
                                   endN: Int, endLast: String): Seq[String] =
    files.zipWithIndex
      .filter { case (f, i) =>
        (if (startLast.nonEmpty) f > startLast else i >= startN) &&
        (if (endLast.nonEmpty) f <= endLast else i < endN)
      }
      .map(_._1)
}

/** Reads exactly `limit` bytes of `in` then reports EOF — the window of
  * a [[WarcDataSource.RangeSlice]]. Both window edges are cut points, so
  * the wrapped gzip/record walk ends cleanly at the boundary. Closing
  * closes `in`. */
private[graft] final class BoundedInputStream(in: java.io.InputStream,
                                              limit: Long)
    extends java.io.InputStream {
  private var left = limit
  override def read(): Int =
    if (left <= 0) -1
    else { val b = in.read(); if (b >= 0) left -= 1; b }
  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    if (left <= 0) return -1
    val n = in.read(b, off, math.min(len.toLong, left).toInt)
    if (n > 0) left -= n
    n
  }
  override def skip(n: Long): Long = {
    if (left <= 0) return 0
    val s = in.skip(math.min(n, left))
    if (s > 0) left -= s
    s
  }
  override def close(): Unit = in.close()
}

private class WarcTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty,
    "warc source needs a path: spark.read.format(\"warc\").load(dir)")
  override def name(): String = s"warc:$path"
  override def schema(): StructType = WarcDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val mode = options.getOrDefault("split_mode", "index")
    require(mode == "index" || mode == "roundrobin",
      s"warc split_mode must be 'index' or 'roundrobin', got '$mode'")
    val sidecar = options.getOrDefault("index_sidecar", "read")
    require(Set("read", "write", "off")(sidecar),
      s"warc index_sidecar must be 'read', 'write', or 'off', got '$sidecar'")
    new WarcScanBuilder(path,
      options.getLong("split_size", WarcDataSource.DefaultSplitBytes), mode,
      sidecar)
  }
}

private class WarcScanBuilder(path: String, splitBytes: Long, splitMode: String,
                              sidecar: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = WarcDataSource.Schema
  // None = no type predicate; Some(set) = warc_type ∈ set (the
  // INTERSECTION of every pushed equality — possibly empty)
  private var typeFilter: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("warc_type", _: String) => true
      case _ => false
    }
    pushed = accepted
    val values = accepted.map { case EqualTo(_, v: String) => v }.toSet
    // a conjunction of equalities to DIFFERENT values is unsatisfiable:
    // the intersection set goes empty and the reader yields no rows
    // (never first-filter-wins)
    typeFilter =
      if (values.isEmpty) None
      else if (values.size == 1) Some(values)
      else Some(Set.empty[String])
    rejected // everything else stays a residual predicate
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new WarcScan(path, required, typeFilter, splitBytes, splitMode, sidecar)
}

private class WarcScan(path: String, required: StructType,
                       typeFilter: Option[Set[String]],
                       splitBytes: Long, splitMode: String,
                       sidecar: String) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WarcScan(path=$path, columns=${required.fieldNames.mkString(",")}" +
      typeFilter.map(t => s", warc_type=${t.mkString("|")}").getOrElse("") + ")"

  // driver-side session Hadoop conf, shipped to executors as a BROADCAST:
  // a bare SerializableConfiguration in the reader factory re-parses the
  // whole property map per TASK, which on the stream's one-tiny-file-per-
  // task grain dominates the actual read; the broadcast deserializes once
  // per executor and costs each task an id lookup
  private val conf = org.apache.spark.sql.SparkSession.active.sparkContext
    .broadcast(new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))

  override def planInputPartitions(): Array[InputPartition] = {
    // size-balanced planning (see class doc): driver-side listing is
    // bounded metadata, like any FileIndex — through the Hadoop FS API,
    // so object-store crawl buckets plan like local directories. Files
    // larger than the split target get a member cut index first (one
    // Spark job, one linear walk per un-cached file) so their splits are
    // seek-and-read byte ranges, not N full decompression walks.
    val files = WarcDataSource.listFiles(path, conf.value.value)
    val indexes =
      if (splitMode == "index") {
        val oversized = files.filter(_._2 > splitBytes)
        if (oversized.isEmpty) Map.empty[String, graft.sources.Warc.CutIndex]
        else WarcDataSource.indexesFor(oversized,
          WarcDataSource.indexMinGap(splitBytes), conf, sidecar)
      } else Map.empty[String, graft.sources.Warc.CutIndex]
    WarcDataSource.planSlicesIndexed(files, splitBytes, indexes)
      .map(sl => WarcInputPartition(sl): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, typeFilter, conf,
      // first-contact combination: a roundrobin read under sidecar=write
      // leaves a cut index behind as a side effect of slice 0's walk, so
      // even the degenerate N-walk first scan makes every later
      // index-mode scan a seek-and-read plan (in index mode the plan-time
      // job already probed/persisted, so the piggyback would be redundant)
      piggybackIndex = splitMode == "roundrobin" && sidecar == "write",
      splitBytes)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WarcMicroBatchStream(path, required, typeFilter, conf, splitBytes,
      splitMode, sidecar)
}

/** File-arrival streaming over an archive directory — crawl drops land
  * as whole files. The offset is (count, name-of-last-file) over the
  * lexicographically-sorted listing, and a micro-batch covers the files
  * whose names fall in the NAME INTERVAL (start.last, end.last]; the
  * batch's TASK grain is the batch planner's (member-indexed range
  * slices for oversized archives, bin-packing for tiny drops) while
  * offsets stay pure name intervals.
  *
  * Interval-by-name (not index-slice) is load-bearing: a directory
  * listing taken CONCURRENTLY with arrivals is not a consistent
  * snapshot — readdir can transiently miss a just-renamed file while
  * already seeing a later-sorting one (hash-ordered dirents), so an
  * index slice against a later, healed listing silently duplicates one
  * file and drops another. Name intervals self-heal that race: a file
  * missed at latestOffset time but visible by planning time sorts into
  * its interval and is processed exactly once.
  *
  * CONTRACT (documented, like the built-in file source's assumptions):
  * arrivals are append-only and lexicographically increasing. True
  * violations fail LOUDLY at planning, checked against the stream's
  * seen-names set (bounded metadata, the built-in file source's
  * device): a previously-assigned file vanishing (deletion), and a
  * never-assigned file at or below the committed start boundary
  * (out-of-order arrival — its interval has already been planned, so
  * it would otherwise be lost silently). */
private class WarcMicroBatchStream(path: String, required: StructType,
                                   typeFilter: Option[Set[String]],
                                   conf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration],
                                   splitBytes: Long, splitMode: String,
                                   sidecar: String)
    extends MicroBatchStream {
  private def listSorted(): Array[String] =
    WarcDataSource.listFiles(path, conf.value.value).map(_._1).toArray
  /** `last` = absolute path of the offset's boundary file ("" at the
    * stream start). Serialized as `n\nlast` — '\n' cannot appear in a
    * path the lister returned. Legacy checkpoints (bare int, r8 format)
    * deserialize with last="", handled by an index-slice fallback for
    * that one transition. */
  private case class WarcOffset(n: Int, last: String) extends Offset {
    override def json(): String = if (last.isEmpty) n.toString
                                  else s"$n\n$last"
  }
  override def initialOffset(): Offset = WarcOffset(0, "")
  override def latestOffset(): Offset = {
    val files = listSorted()
    WarcOffset(files.length, files.lastOption.getOrElse(""))
  }
  override def deserializeOffset(json: String): Offset =
    json.indexOf('\n') match {
      case -1 => WarcOffset(json.trim.toInt, "")
      case i => WarcOffset(json.substring(0, i).toInt, json.substring(i + 1))
    }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  /** Names this stream object has assigned to a batch — the stray
    * detector's memory (bounded: file-name metadata, like the built-in
    * file source's seen log). A transiently-missed file that HEALS into
    * its interval lands here, so it is never mistaken for an
    * out-of-order arrival when the committed count undercounts it; a
    * file below the boundary that was never assigned anywhere is a true
    * violation. In-memory only: across a checkpoint restart the
    * detector re-arms empty (pre-restart strays are beyond recall —
    * the same horizon Spark's file source has past its log window). */
  private val seen = collection.mutable.Set[String]()
  private var adopted = false
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val so = start.asInstanceOf[WarcOffset]
    val eo = end.asInstanceOf[WarcOffset]
    // ONE listing per plan: names drive the offset interval, sizes drive
    // the task grain (a second listing would both double object-store
    // LIST cost and open a race where the two listings disagree)
    val listing = WarcDataSource.listFiles(path, conf.value.value)
    val files = listing.map(_._1).toArray
    val batch = WarcDataSource.selectBatch(files, so.n, so.last, eo.n, eo.last)
    if (!adopted) {
      // first plan of this stream object: a checkpoint restore starts
      // behind an already-committed boundary — adopt that prefix as
      // seen; the stray detector arms from here forward (pre-restart
      // strays are beyond recall, the same horizon the built-in file
      // source has past its seen-log window)
      if (so.last.nonEmpty) seen ++= files.filter(_ <= so.last)
      adopted = true
    }
    // out-of-order arrival: a file at or below the committed start
    // boundary that no batch was ever given — its interval has already
    // been planned and committed, so it can never be assigned: fail
    // loudly rather than lose it silently
    val strays = files.filter(f =>
      so.last.nonEmpty && f <= so.last && !seen(f))
    if (strays.nonEmpty) throw new IllegalStateException(
      s"warc stream: ${strays.length} files sorted at or below the " +
        s"committed boundary '${so.last}' without ever being assigned " +
        s"to a batch (first: '${strays.head}') — a late arrival sorted " +
        "into the committed prefix; arrivals must be lexicographically " +
        "increasing")
    seen ++= batch
    // shrink: stable dirents are always returned by a listing (only
    // entries created DURING a concurrent listing may be missed), so a
    // previously-assigned file absent now means real deletion
    val gone = seen.diff(files.toSet).filter(f =>
      eo.last.isEmpty || f <= eo.last)
    if (gone.nonEmpty) throw new IllegalStateException(
      s"warc stream: ${gone.size} previously-seen files vanished " +
        s"(first: '${gone.toSeq.min}') — arrivals must be append-only")
    // size the batch's task grain exactly like the batch planner: an
    // oversized arriving archive range-splits on its member cut index
    // (a 100 GiB crawl drop used to land as ONE task) and tiny drops
    // bin-pack; offsets stay pure name intervals, so checkpoint
    // compatibility is untouched
    val sizes = listing.toMap
    val batchSized = batch.map(f => (f, sizes(f)))
    val indexes =
      if (splitMode == "index") {
        val oversized = batchSized.filter(_._2 > splitBytes)
        if (oversized.isEmpty) Map.empty[String, graft.sources.Warc.CutIndex]
        else WarcDataSource.indexesFor(oversized,
          WarcDataSource.indexMinGap(splitBytes), conf, sidecar)
      } else Map.empty[String, graft.sources.Warc.CutIndex]
    WarcDataSource.planSlicesIndexed(batchSized, splitBytes, indexes)
      .map(sl => WarcInputPartition(sl): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, typeFilter, conf,
      piggybackIndex = splitMode == "roundrobin" && sidecar == "write",
      splitBytes)
}

private case class WarcInputPartition(slices: Seq[WarcDataSource.Slice])
    extends InputPartition

private class WarcReaderFactory(required: StructType,
                                typeFilter: Option[Set[String]],
                                conf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration],
                                piggybackIndex: Boolean = false,
                                splitBytes: Long = WarcDataSource.DefaultSplitBytes)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(p.asInstanceOf[WarcInputPartition].slices,
      required, typeFilter, conf, piggybackIndex, splitBytes)
}

private class WarcPartitionReader(slices: Seq[WarcDataSource.Slice],
                                  required: StructType,
                                  typeFilter: Option[Set[String]],
                                  conf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration],
                                  piggybackIndex: Boolean = false,
                                  splitBytes: Long = WarcDataSource.DefaultSplitBytes)
    extends PartitionReader[InternalRow] {
  // slices walk lazily in sequence as STREAMS ([[Warc.streamRecords]]):
  // peak heap is O(record), never O(file). Range slices seek to their
  // member cut offset and inflate only their own window; round-robin
  // slices (whole-file / fallback) walk the whole structure but
  // materialize only owned records. Rows assemble column-pruned. Files
  // open through the Hadoop FS API — object-store URIs read like local
  // paths.
  private var pathUtf: UTF8String = _
  private var openStream: java.io.InputStream = _
  private val records: Iterator[Warc.WarcRecord] =
    slices.iterator.flatMap { sl =>
      pathUtf = UTF8String.fromString(sl.file)
      // track the live stream so an early close() (LIMIT) releases it;
      // streamRecords closes it itself on exhaustion or malformation
      val in = WarcDataSource.open(sl.file, conf.value.value)
      openStream = in
      // first-contact piggyback: slice 0 of a round-robin split set is
      // walking the whole structure anyway — under index_sidecar=write it
      // leaves the cut index behind (best-effort, on clean exhaustion
      // only), so the NEXT index-mode scan plans byte-range slices
      // without ever paying a dedicated index walk
      val onIndex: Warc.CutIndex => Unit = sl match {
        case WarcDataSource.FileSlice(f, 0, n) if n > 1 && piggybackIndex =>
          idx => try {
            val c = conf.value.value
            val size = WarcDataSource
              .fsFor(new org.apache.hadoop.fs.Path(f), c)
              .getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen
            WarcDataSource.writeSidecar(f, size, idx, c)
            WarcDataSource.indexCache.put((f, size), idx)
          } catch { case _: java.io.IOException => } // read-only dir: skip
        case _ => null
      }
      val it = WarcDataSource.sliceRecords(sl, in,
        WarcDataSource.indexMinGap(splitBytes), onIndex)
      typeFilter match {
        case Some(types) => it.filter(r => types.contains(r.warcType))
        case None => it
      }
    }
  // column extractors bound once against the PRUNED schema: body_text
  // (the expensive decode) never runs unless requested
  private val getters: Array[Warc.WarcRecord => Any] =
    required.fieldNames.map {
      case "path" => (_: Warc.WarcRecord) => pathUtf
      case "rec_idx" => (r: Warc.WarcRecord) => r.recIdx
      case "warc_type" =>
        (r: Warc.WarcRecord) => UTF8String.fromString(r.warcType)
      case "target_uri" =>
        (r: Warc.WarcRecord) => UTF8String.fromString(r.targetUri)
      case "http_status" => (r: Warc.WarcRecord) => r.httpStatus
      case "content_type" =>
        (r: Warc.WarcRecord) => UTF8String.fromString(r.contentType)
      case "body_text" => (r: Warc.WarcRecord) => UTF8String.fromString(
        Warc.decodeBody(r.contentType, r.body)) // charset-aware transcode
      case other => throw new IllegalArgumentException(
        s"unknown warc column $other")
    }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!records.hasNext) false
    else {
      val r = records.next()
      current = InternalRow.fromSeq(getters.map(_.apply(r)).toSeq)
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit =
    if (openStream != null) {
      try openStream.close() catch { case _: java.io.IOException => }
      openStream = null
    }
}
