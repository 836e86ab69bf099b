package graft

import graft.multimodal.Media
import graft.sources.Warc

/** WARC web-archive source: record walk, HTTP split, gzip members,
  * loud all-or-nothing refusal, and the Spark extraction operator. */
class WarcSpec extends SparkSpec {

  import spark.implicits._

  private def archive(): Array[Byte] = Warc.encode(Seq(
    Warc.record("warcinfo", "", "software: fixture\r\n".getBytes("US-ASCII")),
    Warc.record("request", "http://a.example/x",
      "GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n".getBytes("US-ASCII")),
    Warc.record("response", "http://a.example/x",
      Warc.httpResponse(200, "text/html; charset=utf-8",
        "<html><body>alpha</body></html>".getBytes("UTF-8"))),
    Warc.record("response", "http://a.example/y",
      Warc.httpResponse(404, "text/plain", "gone".getBytes("UTF-8")))))

  "Warc.parse" should "walk records and split HTTP responses" in {
    val recs = Warc.parse(archive()).get
    recs.map(_.warcType) shouldBe Seq("warcinfo", "request", "response", "response")
    recs.map(_.recIdx) shouldBe Seq(0, 1, 2, 3)
    val r2 = recs(2)
    r2.targetUri shouldBe "http://a.example/x"
    r2.httpStatus shouldBe 200
    r2.contentType shouldBe "text/html; charset=utf-8"
    new String(r2.body, "UTF-8") shouldBe "<html><body>alpha</body></html>"
    recs(3).httpStatus shouldBe 404
    new String(recs(3).body, "UTF-8") shouldBe "gone"
    // non-response records carry no HTTP fields
    recs(0).httpStatus shouldBe -1
    recs(1).body.length shouldBe 0
  }

  it should "read per-record gzip members identically to plain" in {
    val plain = Warc.parse(archive()).get
    val gz = Warc.encodeGz(Seq(
      Warc.record("warcinfo", "", "software: fixture\r\n".getBytes("US-ASCII")),
      Warc.record("request", "http://a.example/x",
        "GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n".getBytes("US-ASCII")),
      Warc.record("response", "http://a.example/x",
        Warc.httpResponse(200, "text/html; charset=utf-8",
          "<html><body>alpha</body></html>".getBytes("UTF-8"))),
      Warc.record("response", "http://a.example/y",
        Warc.httpResponse(404, "text/plain", "gone".getBytes("UTF-8")))))
    gz.length should not be 0
    (gz(0) & 0xff) shouldBe 0x1f // really gzip on the wire
    val got = Warc.parse(gz).get
    got.map(_.warcType) shouldBe plain.map(_.warcType)
    got.map(r => new String(r.body, "UTF-8")) shouldBe
      plain.map(r => new String(r.body, "UTF-8"))
  }

  it should "refuse malformed archives wholesale, never partially" in {
    val good = archive()
    Warc.parse(good).isDefined shouldBe true
    // truncation inside the last payload: the WHOLE blob refuses, even
    // though three records parse cleanly before the damage
    Warc.parse(good.take(good.length - 8)) shouldBe None
    // bad version line
    val badVer = good.clone(); badVer(5) = '9'.toByte
    Warc.parse(badVer) shouldBe None
    // missing Content-Length
    val noLen = Warc.record("response", "http://a/x",
      Warc.httpResponse(200, "t", "b".getBytes))
    val stripped = new String(noLen, "US-ASCII")
      .replaceAll("Content-Length: \\d+\r\n", "")
    Warc.parse(stripped.getBytes("US-ASCII")) shouldBe None
    // corrupted gzip member
    val gz = Warc.encodeGz(Seq(Warc.record("warcinfo", "", "a\r\n".getBytes)))
    gz(gz.length - 3) = (gz(gz.length - 3) ^ 0x55).toByte
    Warc.parse(gz) shouldBe None
    // response payload without an HTTP header split
    val noHttp = Warc.record("response", "http://a/x", "nope".getBytes)
    Warc.parse(noHttp) shouldBe None
  }

  private def writeArchiveDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("warcds").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.warc"),
      archive())
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.warc.gz"),
      Warc.encodeGz(Seq(
        Warc.record("response", "http://b.example/z",
          Warc.httpResponse(301, "text/plain", "moved".getBytes("UTF-8"))))))
    dir
  }

  "format(\"warc\")" should "pack small archives into size-targeted partitions" in {
    val dir = writeArchiveDir()
    val df = spark.read.format("warc").load(dir)
    // both fixture files are far below the 128 MiB default target, so
    // planning bin-packs them into ONE task instead of two tiny ones
    df.rdd.getNumPartitions shouldBe 1
    val rows = df.collect()
    rows.length shouldBe 5 // 4 records in a.warc + 1 in b.warc.gz
    val resp = df.where($"warc_type" === "response")
      .select($"target_uri", $"http_status", $"body_text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sortBy(_._1)
    resp shouldBe Array(
      ("http://a.example/x", 200, "<html><body>alpha</body></html>"),
      ("http://a.example/y", 404, "gone"),
      ("http://b.example/z", 301, "moved"))
  }

  it should "prune columns and push the warc_type filter into the scan" in {
    val dir = writeArchiveDir()
    val df = spark.read.format("warc").load(dir)
      .where($"warc_type" === "response").select($"target_uri")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("WarcScan")
    plan should include("columns=target_uri")    // body_text pruned away
    plan should include("warc_type=response")    // filter pushed
    // the pushed equality leaves no residual Filter operator
    plan should not include "Filter ("
    df.collect().map(_.getString(0)).sorted shouldBe Array(
      "http://a.example/x", "http://a.example/y", "http://b.example/z")
    // count() never touches bodies: schema collapses to zero data columns
    spark.read.format("warc").load(dir).count() shouldBe 5L
  }

  it should "stream file arrivals as incremental micro-batches" in {
    val dir = java.nio.file.Files.createTempDirectory("warcstream").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.warc"),
      archive())
    val q = spark.readStream.format("warc").load(dir)
      .where($"warc_type" === "response")
      .select($"target_uri", $"http_status")
      .writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val b1 = spark.table("warc_stream").collect()
      b1.map(_.getString(0)).sorted shouldBe
        Array("http://a.example/x", "http://a.example/y")
      // a later lexicographic arrival becomes its own micro-batch
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.warc.gz"),
        Warc.encodeGz(Seq(Warc.record("response", "http://b.example/z",
          Warc.httpResponse(301, "text/plain", "moved".getBytes("UTF-8"))))))
      q.processAllAvailable()
      val b2 = spark.table("warc_stream").collect()
      b2.map(_.getString(0)).sorted shouldBe Array(
        "http://a.example/x", "http://a.example/y", "http://b.example/z")
      b2.find(_.getString(0).endsWith("/z")).get.getInt(1) shouldBe 301
    } finally q.stop()
  }

  it should "bound a replayed all-legacy batch by its recorded end index" in {
    import graft.sources.WarcDataSource.selectBatch
    // crash between offset-WAL write and commit under the r8 bare-int
    // format: the pending batch replays with BOTH offsets legacy
    // (empty names). Files c,d arrived AFTER the recorded end (n=2) —
    // the replay must stop at index 2 or the next batch (start = that
    // same end) re-plans c,d as duplicates.
    val files = Seq("a.warc", "b.warc", "c.warc", "d.warc")
    selectBatch(files, 0, "", 2, "") shouldBe Seq("a.warc", "b.warc")
    selectBatch(files, 2, "", 4, "") shouldBe Seq("c.warc", "d.warc")
    // legacy start + name-format end: index lower bound, name upper bound
    selectBatch(files, 1, "", 3, "c.warc") shouldBe Seq("b.warc", "c.warc")
    // name-format both: pure (start, end] name interval
    selectBatch(files, 9, "a.warc", 9, "c.warc") shouldBe Seq("b.warc", "c.warc")
    // name-format start + legacy end: names above start, capped at index
    selectBatch(files, 0, "a.warc", 3, "") shouldBe Seq("b.warc", "c.warc")
    // empty stream boundaries select nothing
    selectBatch(files, 0, "", 0, "") shouldBe Seq.empty
  }

  it should "fail loudly when a late file sorts into the committed prefix" in {
    val dir = java.nio.file.Files.createTempDirectory("warcooo").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.warc"),
      archive())
    val q = spark.readStream.format("warc").load(dir)
      .select($"target_uri")
      .writeStream.format("memory").queryName("warc_ooo")
      .outputMode("append").start()
    try {
      q.processAllAvailable() // commits offset (1, .../b.warc)
      // an arrival that sorts BEFORE the committed boundary would shift
      // the slice — the offset's recorded file name catches it loudly
      // instead of silently duplicating b and dropping a
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.warc"),
        archive())
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      e.getMessage should include("lexicographically")
    } finally q.stop()
  }

  it should "split one large archive across partitions with exact record boundaries" in {
    // 40 records across plain and gzip archives, read with a split_size
    // small enough to force multi-way splits: the union must be
    // bit-identical to the unsplit read — every rec_idx exactly once,
    // bodies intact across every split point
    val dir = java.nio.file.Files.createTempDirectory("warcsplit").toString
    def rec(i: Int) = Warc.record("response", s"http://s.example/$i",
      Warc.httpResponse(200 + 100 * (i % 2), "text/plain",
        (s"payload $i :: " + "x" * (50 + i * 7)).getBytes("UTF-8")))
    val recs = (0 until 40).map(rec)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "big.warc"),
      Warc.encode(recs.take(25)))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "big2.warc.gz"),
      Warc.encodeGz(recs.drop(25)))
    val whole = spark.read.format("warc").load(dir)
      .orderBy("path", "rec_idx").collect()
    val split = spark.read.format("warc").option("split_size", 700)
      .load(dir)
    split.rdd.getNumPartitions should be > 2
    split.orderBy("path", "rec_idx").collect() shouldBe whole
    // rec_idx is the archive-global index in BOTH reads: 0..24 and 0..14
    split.where($"path".endsWith("big.warc")).select($"rec_idx").collect()
      .map(_.getInt(0)).sorted shouldBe (0 until 25).toArray
    split.where($"path".endsWith("big2.warc.gz")).select($"rec_idx")
      .collect().map(_.getInt(0)).sorted shouldBe (0 until 15).toArray
    // pushdown composes with splitting: each split filters its own records
    spark.read.format("warc").option("split_size", 700).load(dir)
      .where($"warc_type" === "response").count() shouldBe 40L
  }

  it should "read scheme-qualified file: URIs through the Hadoop FS layer" in {
    // the r10 lister/opener go through the Hadoop FileSystem API so
    // object-store URIs (s3a://, abfs://) work like local dirs; prove the
    // scheme'd path round-trip locally: listing, batch read, and the
    // emitted path column keep the user's scheme form
    val dir = java.nio.file.Files.createTempDirectory("warcuri")
    java.nio.file.Files.write(dir.resolve("a.warc"), archive())
    val uri = "file:" + dir.toString
    val rows = spark.read.format("warc").load(uri)
      .where($"warc_type" === "response")
      .select($"path", $"target_uri")
      .as[(String, String)].collect().sortBy(_._2)
    rows.map(_._2).toSeq shouldBe Seq("http://a.example/x", "http://a.example/y")
    all(rows.map(_._1)) should startWith("file:")
    // and the schemeless form of the same dir still yields bare paths
    val bare = spark.read.format("warc").load(dir.toString)
      .select($"path").distinct().as[String].collect()
    all(bare) should startWith("/")
    // FS-layer listing helper agrees in both renderings
    val conf = spark.sessionState.newHadoopConf()
    graft.sources.WarcDataSource.listFiles(uri, conf)
      .map(_._1).foreach(_ should startWith("file:"))
    graft.sources.WarcDataSource.listFiles(dir.toString, conf)
      .map(_._1).foreach(_ should startWith("/"))
  }

  "Warc.streamRecords" should "walk a stream identically to the byte-array parse" in {
    val bytes = archive()
    val streamed = Warc.streamRecords(
      new java.io.ByteArrayInputStream(bytes), _ => true).toSeq
    val parsed = Warc.parse(bytes).get
    streamed.map(r => (r.recIdx, r.warcType, r.targetUri, r.httpStatus,
      r.contentType, new String(r.body, "UTF-8"))) shouldBe
      parsed.map(r => (r.recIdx, r.warcType, r.targetUri, r.httpStatus,
        r.contentType, new String(r.body, "UTF-8")))
    // gzip members too, and ownership restriction skips bodies
    val gzStreamed = Warc.streamRecords(
      new java.io.ByteArrayInputStream(Warc.encodeGz(Seq(
        Warc.record("warcinfo", "", "software: fixture\r\n".getBytes("US-ASCII")),
        Warc.record("request", "http://a.example/x",
          "GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n".getBytes("US-ASCII")),
        Warc.record("response", "http://a.example/x",
          Warc.httpResponse(200, "text/html; charset=utf-8",
            "<html><body>alpha</body></html>".getBytes("UTF-8"))),
        Warc.record("response", "http://a.example/y",
          Warc.httpResponse(404, "text/plain", "gone".getBytes("UTF-8")))))),
      idx => idx % 2 == 1).toSeq
    gzStreamed.map(_.recIdx) shouldBe Seq(1, 3)
    gzStreamed.last.httpStatus shouldBe 404
  }

  it should "throw on malformation instead of yielding partial silence" in {
    val bad = archive().dropRight(2) // truncated record separator
    val e = intercept[Warc.WarcFormatException] {
      Warc.streamRecords(new java.io.ByteArrayInputStream(bad), _ => true)
        .toSeq
    }
    e.getMessage should include("malformed")
  }

  it should "read a >2 GiB (inflated) multi-member archive with O(record) heap" in {
    // The byte-array walk could never do this: readAllBytes / the inflate
    // buffer cap at Int.MaxValue, and the whole archive would resident on
    // heap per slice. Generate (not commit) a gzip archive whose INFLATED
    // size passes 2 GiB — 72 members × 32 MiB zero bodies ≈ 2.25 GiB —
    // compressed to a few MB on disk; walk it via the DSv2 source with a
    // split_size that fans it into slices, asserting exact global record
    // indexes and that bodies never materialize for a uri-only projection.
    val members = 72
    val bodyLen = 32 * 1024 * 1024
    val dir = java.nio.file.Files.createTempDirectory("warcbig")
    val f = dir.resolve("big.warc.gz")
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(f), 1 << 20)
    val body = new Array[Byte](bodyLen) // zeros: ~32K gz per member
    (0 until members).foreach { i =>
      val gz = new java.util.zip.GZIPOutputStream(out, 1 << 16)
      gz.write(Warc.record("response", s"http://big.example/$i",
        Warc.httpResponse(200, "application/octet-stream", body)))
      gz.finish()
    }
    out.close()
    (members.toLong * bodyLen) should be > (Int.MaxValue.toLong)
    try {
      // split on DISK size (the planner's unit): ~0.5 MB over a ~2 MB gz
      // file fans into several slices, each an independent O(record) walk
      val rows = spark.read.format("warc")
        .option("split_size", (512L * 1024).toString)
        .load(dir.toString)
        .select($"rec_idx", $"target_uri")
        .as[(Int, String)].collect().sortBy(_._1)
      rows.length shouldBe members
      rows.map(_._1).toSeq shouldBe (0 until members)
      rows.map(_._2).toSeq shouldBe (0 until members).map(i => s"http://big.example/$i")
    } finally {
      java.nio.file.Files.delete(f); java.nio.file.Files.delete(dir)
    }
  }

  it should "intersect conflicting warc_type equalities to the empty scan" in {
    val dir = writeArchiveDir()
    // both equalities are accepted as pushed; their value sets intersect
    // to ∅ — the correct result is zero rows, never first-filter-wins
    spark.read.format("warc").load(dir)
      .where($"warc_type" === "response" && $"warc_type" === "request")
      .count() shouldBe 0L
    // sanity: a self-consistent conjunction still returns the real rows
    spark.read.format("warc").load(dir)
      .where($"warc_type" === "response" && $"warc_type" === "response")
      .count() shouldBe 3L
  }

  "planSlices" should "fan out big files and bin-pack small ones deterministically" in {
    import graft.sources.WarcDataSource.{planSlices, FileSlice}
    // one 10-unit file at target 4 → 3 splits; two 1-unit files pack
    val plan = planSlices(Seq(("big", 10L), ("s1", 1L), ("s2", 1L)), 4L)
    plan.flatten.toSet shouldBe Set(
      FileSlice("big", 0, 3), FileSlice("big", 1, 3), FileSlice("big", 2, 3),
      FileSlice("s1", 0, 1), FileSlice("s2", 0, 1))
    // first-fit packs each tiny file into a big-split bin's 1-unit gap
    // (3 bins total, never 5 single-slice tasks)
    plan.length shouldBe 3
    plan.find(_.exists(_.file == "s1")).get.length shouldBe 2
    plan.find(_.exists(_.file == "s2")).get.length shouldBe 2
    // deterministic: same inputs, same plan, any listing order
    planSlices(Seq(("s2", 1L), ("big", 10L), ("s1", 1L)), 4L) shouldBe plan
  }

  it should "fail the task loudly on a malformed archive file" in {
    val dir = java.nio.file.Files.createTempDirectory("warcbad").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.warc"),
      "WARC/9.9\r\nnope".getBytes("US-ASCII"))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("warc").load(dir).collect()
    }
    e.getMessage should include("malformed WARC archive")
  }

  "decodeBody" should "honor HTTP charset, meta fallback, and UTF-8 default" in {
    val latin = "café crème".getBytes("windows-1252")
    // HTTP header charset wins
    Warc.decodeBody("text/html; charset=windows-1252", latin) shouldBe
      "café crème"
    // meta tag in the first 1024 bytes is the fallback
    val metaPage = ("<html><head><meta charset=\"ISO-8859-1\"></head>" +
      "<body>café</body></html>").getBytes("ISO-8859-1")
    Warc.decodeBody("text/html", metaPage) should include("café")
    // no charset anywhere: UTF-8
    Warc.decodeBody("text/plain",
      "é中文".getBytes("UTF-8")) shouldBe "é中文"
    // unknown charset name falls back to UTF-8 instead of dropping
    Warc.decodeBody("text/html; charset=not-a-charset",
      "plain".getBytes("UTF-8")) shouldBe "plain"
    // mislabeled bytes surface as replacement chars, never an exception
    val garbled = Warc.decodeBody("text/plain; charset=utf-8", latin)
    garbled should include("�")
  }

  it should "transcode identically through the operator and the connector" in {
    val body = "naïve résumé".getBytes("windows-1252")
    val arch = Warc.encode(Seq(Warc.record("response", "http://l.example/1",
      Warc.httpResponse(200, "text/html; charset=windows-1252", body))))
    val viaOp = Warc.extractResponses(
      Seq(Media.MediaRecord(1L, "application/warc", arch)).toDS())
      .select($"body_text").head().getString(0)
    val dir = java.nio.file.Files.createTempDirectory("warccs").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "l.warc"), arch)
    val viaDs = spark.read.format("warc").load(dir)
      .where($"warc_type" === "response")
      .select($"body_text").head().getString(0)
    viaOp shouldBe "naïve résumé"
    viaDs shouldBe viaOp
  }

  "extractResponses" should "emit one row per HTTP response, dropping bad archives" in {
    val rows = Warc.extractResponses(Seq(
      Media.MediaRecord(1L, "application/warc", archive()),
      Media.MediaRecord(2L, "application/warc", Warc.encodeGz(Seq(
        Warc.record("response", "http://b.example/z",
          Warc.httpResponse(301, "text/plain", "moved".getBytes("UTF-8")))))),
      Media.MediaRecord(3L, "application/warc", "not a warc".getBytes))
      .toDS()).collect()
    rows.map(_.getLong(0)).sorted shouldBe Seq(1L, 1L, 2L)
    val r = rows.filter(_.getLong(0) == 2L).head
    r.getString(2) shouldBe "http://b.example/z"
    r.getInt(3) shouldBe 301
    r.getString(5) shouldBe "moved"
    // request/warcinfo records of archive 1 contribute no rows
    rows.filter(_.getLong(0) == 1L).map(_.getInt(1)).sorted shouldBe Seq(2, 3)
  }
}
