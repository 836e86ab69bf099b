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
  *  - PLANNING: one input partition per archive file (the WARC gzip
  *    member stream is not block-splittable without a sync-marker scan,
  *    and crawl archives arrive as many ~1 GB files — file-level
  *    parallelism is the format's native grain, exactly how Spark's own
  *    binaryFile/text sources treat non-splittable compression). The
  *    driver lists the directory once — bounded metadata, no data read.
  *  - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): the reader
  *    materializes ONLY requested columns; a `count()` or a
  *    uri-only projection never allocates body strings (the dominant
  *    cost — bodies are the archive).
  *  - FILTER PUSHDOWN ([[SupportsPushDownFilters]]): `warc_type = X`
  *    equality is evaluated during the record walk, so request/metadata
  *    records are dropped before any HTTP split or row assembly; the
  *    filter is reported as pushed so Catalyst drops its residual.
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
    * stable regardless of what the filter pushes down). */
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("rec_idx", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = false),
    StructField("http_status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("body_text", StringType, nullable = false)))
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
    new WarcScanBuilder(path)
}

private class WarcScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = WarcDataSource.Schema
  private var typeFilter: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("warc_type", _: String) => true
      case _ => false
    }
    pushed = accepted
    typeFilter = accepted.collectFirst { case EqualTo(_, v: String) => v }
    rejected // everything else stays a residual predicate
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new WarcScan(path, required, typeFilter)
}

private class WarcScan(path: String, required: StructType,
                       typeFilter: Option[String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WarcScan(path=$path, columns=${required.fieldNames.mkString(",")}" +
      typeFilter.map(t => s", warc_type=$t").getOrElse("") + ")"

  override def planInputPartitions(): Array[InputPartition] = {
    // one partition per archive file: the format's native parallelism
    // grain (driver-side listing is bounded metadata, like any FileIndex)
    val dir = new java.io.File(path)
    val files =
      if (dir.isFile) Array(dir)
      else Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith(".")
          && !f.getName.startsWith("_"))
    files.sortBy(_.getName).map(f =>
      WarcInputPartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, typeFilter)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WarcMicroBatchStream(path, required, typeFilter)
}

/** File-arrival streaming over an archive directory — crawl drops land
  * as whole files, so the stream's offset IS the length of the
  * lexicographically-sorted file list and each micro-batch covers the
  * newly-arrived suffix, one partition per file (the batch grain).
  * CONTRACT (documented, like the built-in file source's assumptions):
  * arrivals are append-only and lexicographically increasing — a file
  * sorting before an already-committed one would silently shift the
  * prefix, so [[planInputPartitions]] re-checks the slice bounds and
  * fails loudly if the directory shrank. */
private class WarcMicroBatchStream(path: String, required: StructType,
                                   typeFilter: Option[String])
    extends MicroBatchStream {
  private def listSorted(): Array[String] = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".")
        && !f.getName.startsWith("_"))
      .map(_.getAbsolutePath).sorted
  }
  private case class WarcOffset(n: Int) extends Offset {
    override def json(): String = n.toString
  }
  override def initialOffset(): Offset = WarcOffset(0)
  override def latestOffset(): Offset = WarcOffset(listSorted().length)
  override def deserializeOffset(json: String): Offset =
    WarcOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WarcOffset].n
    val e = end.asInstanceOf[WarcOffset].n
    val files = listSorted()
    if (files.length < e) throw new IllegalStateException(
      s"warc stream: directory shrank below committed offset $e " +
        s"(${files.length} files) — arrivals must be append-only")
    files.slice(s, e).map(f => WarcInputPartition(f): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, typeFilter)
}

private case class WarcInputPartition(file: String) extends InputPartition

private class WarcReaderFactory(required: StructType,
                                typeFilter: Option[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(p.asInstanceOf[WarcInputPartition].file,
      required, typeFilter)
}

private class WarcPartitionReader(file: String, required: StructType,
                                  typeFilter: Option[String])
    extends PartitionReader[InternalRow] {
  // the whole archive parses up front (gzip members are one stream);
  // rows then assemble lazily, only the pruned columns materialized
  private val records: Iterator[Warc.WarcRecord] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file))
    val parsed = Warc.parse(bytes).getOrElse(
      throw new java.io.IOException(s"malformed WARC archive: $file"))
    val it = parsed.iterator
    typeFilter match {
      case Some(t) => it.filter(_.warcType == t)
      case None => it
    }
  }
  private val pathUtf = UTF8String.fromString(file)
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
  override def close(): Unit = ()
}
