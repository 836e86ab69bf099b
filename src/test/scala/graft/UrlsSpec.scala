package graft

import graft.functions.Urls
import org.apache.spark.sql.functions._

/** Hand-computed cases for the archive-style URL canonicalizer — each
  * rule exercised in isolation and in combination, plus the passthrough
  * and null conventions the x40/d14 oracles rely on.
  */
class UrlsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Urls.canonical_url(col("u"))).as[String].collect().toSeq
  }

  private def surt(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Urls.surt_key(col("u"))).as[String].collect().toSeq
  }

  "canonical_url" should "apply the full rule set on a messy URL" in {
    canon("HTTP://bob:pw@WWW.Example.COM:80/A/b?utm_source=x&b=2&a=1#f") shouldBe
      Seq("http://example.com/A/b?a=1&b=2")
  }

  it should "keep a non-default port, including :80 under https" in {
    canon("https://Example.com:80/", "hTTp://www2.E.com:8080/p") shouldBe
      Seq("https://example.com:80/", "http://e.com:8080/p")
  }

  it should "strip default ports per scheme" in {
    canon("http://e.com:80/p", "https://e.com:443/p") shouldBe
      Seq("http://e.com/p", "https://e.com/p")
  }

  it should "canonicalize an empty path to / and preserve path case" in {
    canon("http://EXAMPLE.com", "http://e.com/CaseD") shouldBe
      Seq("http://example.com/", "http://e.com/CaseD")
  }

  it should "drop the ? when only tracking params survive filtering" in {
    canon("http://e.com/x?utm_campaign=C",
      "http://e.com/p?gclid&x=1",
      "http://e.com/p?fbclid=1&igshid=2") shouldBe
      Seq("http://e.com/x", "http://e.com/p?x=1", "http://e.com/p")
  }

  it should "sort surviving params byte-wise" in {
    canon("http://e.com/p?b=2&a=10&a=1") shouldBe
      Seq("http://e.com/p?a=1&a=10&b=2")
  }

  it should "strip all leading www labels but not an interior one" in {
    canon("http://www2.e.com/p", "http://www.www.e.com/p",
      "http://a.www.e.com/p") shouldBe
      Seq("http://e.com/p", "http://e.com/p", "http://a.www.e.com/p")
  }

  it should "be idempotent on a randomized messy-URL corpus" in {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val urls = Seq.fill(400) {
      pick(Seq("HTTP", "http", "https", "HtTpS", "ftp")) + "://" +
        pick(Seq("", "u@", "u:p@")) +
        pick(Seq("", "www.", "WWW2.", "www.www.")) +
        pick(Seq("E.com", "a.B.org", "x.co.uk", "127.0.0.1")) +
        pick(Seq("", ":80", ":443", ":8080", ":")) +
        pick(Seq("", "/", "/A/b", "/p%2Fq", "/a//b/")) +
        pick(Seq("", "?", "?a=1", "?b=2&a=1&a=10", "?utm_source=x&z",
          "?gclid=1", "?UTM_X=keep")) +
        pick(Seq("", "#f", "#a?b"))
    }
    val out = urls.toDF("u")
      .select(Urls.canonical_url(col("u")).as("c1"))
      .select(col("c1"), Urls.canonical_url(col("c1")).as("c2"))
      .as[(String, String)].collect()
    out.foreach { case (c1, c2) => c2 shouldBe c1 }
  }

  it should "pass scheme-less input through unchanged and be null-safe" in {
    canon("relative/Path?b=2&a=1") shouldBe Seq("relative/Path?b=2&a=1")
    import spark.implicits._
    Seq(Option.empty[String]).toDF("u")
      .select(Urls.canonical_url(col("u"))).as[Option[String]]
      .collect().toSeq shouldBe Seq(None)
  }

  "surt_key" should "reverse host labels and carry path + canonical query" in {
    surt("http://a.b.Example.com/p?z=1&utm_source=s",
      "HTTP://WWW.Example.COM:80#f") shouldBe
      Seq("com,example,b,a)/p?z=1", "com,example)/")
  }

  it should "pass scheme-less input through unchanged" in {
    surt("no/scheme/here") shouldBe Seq("no/scheme/here")
  }

  "href_targets" should "extract quoted hrefs in order, any attribute case" in {
    import spark.implicits._
    Seq("""<a href="http://a.com/1">x</a><link href='/rel'><a HREF="u">""")
      .toDF("h").select(Urls.href_targets(col("h"))).as[Seq[String]]
      .collect().head shouldBe Seq("http://a.com/1", "/rel", "u")
  }

  "linkGraph" should "count canonical host edges, dropping relative ends" in {
    import spark.implicits._
    val pages = Seq(
      ("http://WWW.src.com/a",
        """<a href="https://T1.com/x?utm_source=s">l</a>
          |<a href='http://www.t1.com:80/y'>l</a>
          |<a href="/relative">l</a>""".stripMargin),
      ("not-absolute", """<a href="http://t2.com/">l</a>"""),
      ("http://src.com:8080/b", """<a href="https://t2.com:443/z">l</a>"""))
      .toDF("src_url", "html")
    val got = Urls.linkGraph(pages, col("src_url"), col("html"))
      .as[(String, String, Long)].collect().toSet
    got shouldBe Set(
      ("src.com", "t1.com", 2L),
      ("src.com:8080", "t2.com", 1L))
  }

  "anchor_pairs / anchor_text" should "extract and clean element text" in {
    import spark.implicits._
    val html =
      "<A CLASS='z' HREF=\"http://a.com/1\">read <b>more</b></A>" +
        "<a href='u2'>  line\n  broken </a>" +
        "<a href=\"u3\"><img src='i'/></a>" +
        "<a name='no-href'>skip</a>"
    val got = Seq(html).toDF("h")
      .select(explode(Urls.anchor_pairs(col("h"))).as("p"))
      .select(col("p.href"), Urls.anchor_text(col("p.anchor_html")))
      .as[(String, String)].collect().toSeq
    got shouldBe Seq(
      ("http://a.com/1", "read more"),
      ("u2", "line broken"),
      ("u3", ""))
  }

  "anchorTextTopK" should "pool anchors per canonical target and rank top-k" in {
    import spark.implicits._
    // t1.com/x reached under three variants -> one canonical key; "best"
    // wins on count, then "alpha" beats "beta" on the tiebreak at k=2.
    val pages = Seq(
      ("http://s1.com/", "<a href=\"https://T1.com/x?utm_source=s\">best</a>" +
        "<a href='https://t1.com/x'>alpha</a>"),
      ("http://s2.com/", "<a href=\"https://www.t1.com:443/x\">best</a>" +
        "<a href='https://t1.com/x'>beta</a>"),
      ("not-absolute", "<a href=\"https://t1.com/x\">ignored</a>"),
      ("http://s3.com/", "<a href='/rel'>rel</a>" +
        "<a href=\"http://t2.com\"> <b></b> </a>"))
      .toDF("src_url", "html")
    val got = Urls.anchorTextTopK(pages, col("src_url"), col("html"), k = 2)
      .as[(String, String, Long)].collect().toSet
    // t2.com's only anchor cleans to '' -> dropped entirely; the
    // non-absolute src and the relative dst never reach aggregation.
    got shouldBe Set(
      ("https://t1.com/x", "best", 2L),
      ("https://t1.com/x", "alpha", 1L))
  }

  "linkDensityFeatures" should "compute per-page link-quality features" in {
    import spark.implicits._
    // page 1: 40 html chars around 2 links — one internal (same canonical
    // host as the page, www/port variance), one external, 3+4 anchor
    // chars; page 2: relative target counts as a link but never external;
    // page 3: no links at all.
    val pages = Seq(
      (1L, "http://e.com/p",
        "<a href=\"http://WWW.e.com:80/q\">int</a><a href='http://x.org'>ext!</a>"),
      (2L, "not-absolute", "<a href=\"/rel\">r</a>"),
      (3L, "http://e.com/z", "<p>no links</p>"))
      .toDF("doc_id", "src_url", "html")
    val got = Urls.linkDensityFeatures(pages, col("doc_id"), col("src_url"),
      col("html")).as[(Long, Long, Long, Long, Double, Double)]
      .collect().toSet
    val html1Len = "<a href=\"http://WWW.e.com:80/q\">int</a><a href='http://x.org'>ext!</a>".length
    got shouldBe Set(
      (1L, 2L, 1L, 7L,
        math.floor(7.0 / html1Len * 1000000 + 0.5) / 1000000.0, 0.5),
      (2L, 1L, 0L, 1L,
        math.floor(1.0 / 20 * 1000000 + 0.5) / 1000000.0, 0.0),
      (3L, 0L, 0L, 0L, 0.0, 0.0))
  }
}
