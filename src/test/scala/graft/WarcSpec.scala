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

  "format(\"warc\")" should "read archive directories with one partition per file" in {
    val dir = writeArchiveDir()
    val df = spark.read.format("warc").load(dir)
    df.rdd.getNumPartitions shouldBe 2
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
