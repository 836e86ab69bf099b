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
  *  - SPLIT SEMANTICS: WARC gzip members and plain records have no
  *    seekable sync marker, so splits own records ROUND-ROBIN by record
  *    index (split k of n owns records with idx % n == k). Every split
  *    walks the whole archive's record STRUCTURE (and, for .gz, pays
  *    the shared inflate — the splittable-gzip tradeoff: inflation is
  *    the cheap linear pass) but copies/HTTP-splits/charset-decodes
  *    ONLY its owned records, which is where archive read time actually
  *    goes. `rec_idx` stays globally exact and each record has exactly
  *    one owner, so a split union is bit-identical to an unsplit read.
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
  * Parse semantics are [[Warc.parse]]'s, including the loud
  * all-or-nothing refusal — a malformed archive raises (fail-fast task
  * error) rather than silently contributing partial rows; crawl jobs
  * that prefer drop-and-continue use the operator form. */
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

  /** One work unit: split `splitIdx` of `numSplits` over `file`
    * (1-of-1 = the whole file). */
  final case class FileSlice(file: String, splitIdx: Int, numSplits: Int)

  /** Plan (size, file) pairs into partitions: big files fan out into
    * round-robin splits, then slices bin-pack up to `target` bytes
    * (first-fit over the size-sorted list — same shape as Spark's
    * FilePartition packing). Deterministic: order depends only on
    * names and sizes. */
  def planSlices(files: Seq[(String, Long)], target: Long): Seq[Seq[FileSlice]] = {
    require(target > 0, s"warc split_size must be positive, got $target")
    val slices = files.sortBy(_._1).flatMap { case (f, size) =>
      val n = math.max(1L, (size + target - 1) / target).toInt
      (0 until n).map(k => (FileSlice(f, k, n), size / n))
    }
    // pack: descending by cost, first bin that fits, else new bin
    val bins = collection.mutable.ArrayBuffer[(collection.mutable.ArrayBuffer[FileSlice], Long)]()
    slices.sortBy { case (sl, cost) => (-cost, sl.file, sl.splitIdx) }
      .foreach { case (sl, cost) =>
        bins.indexWhere(_._2 + cost <= target) match {
          case -1 => bins += ((collection.mutable.ArrayBuffer(sl), cost))
          case i => bins(i) = (bins(i)._1 += sl, bins(i)._2 + cost)
        }
      }
    bins.map(_._1.toSeq).toSeq
  }

  /** The path's FileSystem, with local paths unwrapped to the RAW local
    * FS: `LocalFileSystem` is a ChecksumFileSystem, and its per-open
    * probe for a sibling `.crc` file doubles syscalls on the
    * many-tiny-archives shape (the WARC stream's batch grain) for
    * checksums WARC archives never carry. */
  private def fsFor(p: org.apache.hadoop.fs.Path,
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

  /** Open a listed file for the streaming record walk (executor side). */
  private[graft] def open(file: String,
                          conf: org.apache.hadoop.conf.Configuration): java.io.InputStream = {
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

private class WarcTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty,
    "warc source needs a path: spark.read.format(\"warc\").load(dir)")
  override def name(): String = s"warc:$path"
  override def schema(): StructType = WarcDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(path,
      options.getLong("split_size", WarcDataSource.DefaultSplitBytes))
}

private class WarcScanBuilder(path: String, splitBytes: Long)
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

  override def build(): Scan = new WarcScan(path, required, typeFilter, splitBytes)
}

private class WarcScan(path: String, required: StructType,
                       typeFilter: Option[Set[String]],
                       splitBytes: Long) extends Scan with Batch {
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
    // so object-store crawl buckets plan like local directories
    WarcDataSource.planSlices(
      WarcDataSource.listFiles(path, conf.value.value), splitBytes)
      .map(sl => WarcInputPartition(sl): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, typeFilter, conf)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WarcMicroBatchStream(path, required, typeFilter, conf)
}

/** File-arrival streaming over an archive directory — crawl drops land
  * as whole files. The offset is (count, name-of-last-file) over the
  * lexicographically-sorted listing, and a micro-batch covers the files
  * whose names fall in the NAME INTERVAL (start.last, end.last] — one
  * partition per file (the batch grain).
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
                                   conf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration])
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
    val files = listSorted()
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
    batch.map(f => WarcInputPartition(
      Seq(WarcDataSource.FileSlice(f, 0, 1))): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, typeFilter, conf)
}

private case class WarcInputPartition(slices: Seq[WarcDataSource.FileSlice])
    extends InputPartition

private class WarcReaderFactory(required: StructType,
                                typeFilter: Option[Set[String]],
                                conf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(p.asInstanceOf[WarcInputPartition].slices,
      required, typeFilter, conf)
}

private class WarcPartitionReader(slices: Seq[WarcDataSource.FileSlice],
                                  required: StructType,
                                  typeFilter: Option[Set[String]],
                                  conf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration])
    extends PartitionReader[InternalRow] {
  // slices walk lazily in sequence as STREAMS ([[Warc.streamRecords]]):
  // peak heap is O(record), never O(file) — a 100 GiB archive sliced 800
  // ways costs 800 linear walks (the splittable-gzip tradeoff) but one
  // record of memory each, where the old byte-array walk held the whole
  // inflated archive per slice and failed outright past 2 GiB. Only
  // OWNED records materialize; rows assemble column-pruned. Files open
  // through the Hadoop FS API — object-store URIs read like local paths.
  private var pathUtf: UTF8String = _
  private var openStream: java.io.InputStream = _
  private val records: Iterator[Warc.WarcRecord] =
    slices.iterator.flatMap { sl =>
      val owns: Int => Boolean =
        if (sl.numSplits == 1) _ => true
        else idx => idx % sl.numSplits == sl.splitIdx
      pathUtf = UTF8String.fromString(sl.file)
      // track the live stream so an early close() (LIMIT) releases it;
      // streamRecords closes it itself on exhaustion or malformation
      val in = WarcDataSource.open(sl.file, conf.value.value)
      openStream = in
      val it = Warc.streamRecords(in, owns, sl.file)
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
