package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Archive-style URL canonicalization — the crawl-side twin of
  * [[Domains]]' DNS-name parsing, and the identity function behind
  * URL-level dedup of a web crawl (the same page is fetched under
  * `HTTP://WWW.Site.com:80/a?utm_source=x&b=2&a=1#frag` and
  * `http://site.com/a?a=1&b=2`; byte-exact dedup misses every such pair).
  * The rules follow the public web-archive canonicalizers (the
  * IA/Common-Crawl CDX family — SURT canonicalization):
  *
  *  - scheme and host lowercase; userinfo (`user:pass@`) stripped
  *  - default ports stripped (`:80` for http, `:443` for https; any
  *    other explicit port is identity-bearing and kept)
  *  - a leading `www` / `www2` / `www\d*.` host label stripped
  *  - fragment stripped; empty path becomes `/`
  *  - tracking/attribution query parameters dropped
  *    ([[Urls.TrackingParamPattern]]: `utm_*` and the click-ID set)
  *  - surviving query parameters sorted byte-wise (query-string ORDER is
  *    serving-irrelevant; VALUE order within a repeated name is kept by
  *    the sort's stability on full `name=value` strings)
  *  - a URL left with no parameters loses its `?`
  *
  * Scope (documented, deliberate): no percent-encoding normalization and
  * no `.`/`..` path-segment resolution — both need a decode table a
  * Column expression chain can't carry cheaply, and crawl URLs arrive
  * from the fetcher already resolved. Non-absolute inputs (no
  * `scheme://`) pass through unchanged rather than guessing a base.
  *
  * Everything is composed from codegen'd built-ins (`regexp_*`, array
  * HOFs) — map-only, zero shuffle, and each step has a literal DuckDB
  * twin (Java and RE2 agree on every pattern used here).
  *
  * [[surtKey]] additionally emits the Sort-friendly URI Reordering
  * Transform form (`com,example)/path?query`): reversing the host labels
  * makes one registered domain a contiguous KEY RANGE, so sorting or
  * range-partitioning a 100 TB crawl by SURT key clusters each site's
  * pages into the same partitions — per-site aggregation and
  * intra-domain dedup then shuffle narrow instead of global.
  */
object Urls {

  /** Query parameters dropped by canonicalization: campaign attribution
    * (`utm_*`) and the cross-site click-ID set. Matches the parameter
    * NAME — `name=...` or a bare valueless `name`. */
  val TrackingParamPattern: String =
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|yclid|mc_eid|igshid)(=|$)"

  private val Scheme = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** True when the value carries an explicit `scheme://`. */
  def is_absolute_url(u: Column): Column = u.rlike(Scheme)

  /** Lowercased scheme of an absolute URL ('' when not absolute). */
  def url_scheme(u: Column): Column = lower(regexp_extract(u, Scheme, 1))

  /** Canonical host: authority minus userinfo, lowercased, minus the
    * scheme's default port, minus a leading `www\d*.` label. */
  def url_host(u: Column): Column = {
    val authority = regexp_extract(u, Scheme + "([^/?#]*)", 2)
    val hostPort = lower(regexp_replace(authority, "^[^@]*@", ""))
    val noDefault =
      when(url_scheme(u) === "http", regexp_replace(hostPort, ":80$", ""))
        .when(url_scheme(u) === "https", regexp_replace(hostPort, ":443$", ""))
        .otherwise(hostPort)
    // `(...)+`, not one label: stripping exactly one `www.` would make
    // `www.www.e.com` canonicalize to a form that canonicalizes AGAIN —
    // the canonical form must be a fixed point (spec'd: idempotence on a
    // randomized corpus).
    regexp_replace(noDefault, "^(www[0-9]*\\.)+", "")
  }

  /** Path component of an absolute URL; empty path canonicalizes to
    * `/` (`http://h` and `http://h/` are the same resource). */
  def url_path(u: Column): Column = {
    val p = regexp_extract(u, Scheme + "[^/?#]*([^?#]*)", 2)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Canonical query string: fragment dropped, parameters split on `&`,
    * empties and tracking parameters removed, survivors sorted
    * byte-wise and rejoined ('' when nothing survives). */
  def url_query_canonical(u: Column): Column = {
    val q = regexp_extract(regexp_replace(u, "#.*", ""), "\\?(.*)", 1)
    val params = filter(split(q, "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern))
    array_join(array_sort(params), "&")
  }

  /** Full canonical form (see object doc for the rule list). Inputs
    * without a `scheme://` pass through unchanged. */
  def canonical_url(u: Column): Column = {
    val cq = url_query_canonical(u)
    val canon = concat(url_scheme(u), lit("://"), url_host(u), url_path(u),
      when(cq =!= "", concat(lit("?"), cq)).otherwise(lit("")))
    when(is_absolute_url(u), canon).otherwise(u)
  }

  /** SURT key of an absolute URL: host labels reversed and comma-joined,
    * then `)` + canonical path/query — `http://a.example.com/p?q=1` →
    * `com,example,a)/p?q=1`. Scheme-less inputs pass through (same
    * convention as [[canonical_url]]). Sorting a crawl by this key makes
    * every registered domain one contiguous range. */
  def surt_key(u: Column): Column = {
    val cq = url_query_canonical(u)
    val key = concat(
      array_join(reverse(split(url_host(u), "\\.")), ","),
      lit(")"), url_path(u),
      when(cq =!= "", concat(lit("?"), cq)).otherwise(lit("")))
    when(is_absolute_url(u), key).otherwise(u)
  }

  /** All `href` attribute values (double- or single-quoted) in an HTML
    * column, in document order. One codegen'd regex pass — the same
    * extraction class as [[graft.operators.Corpus.stripHtml]]'s tag
    * chain, and deliberately regex-grade: real crawl pipelines extract
    * outlinks from the raw fetch body before (and instead of) a full
    * HTML parse. */
  def href_targets(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href=[\"']([^\"']*)[\"']"), lit(1))

  /** Host-level web-graph construction — the input to PageRank-family
    * quality signals ([[graft.operators.Graph.pagerank]]) over a crawl:
    * explode every page's href targets, keep absolute src and dst
    * (relative-link resolution is out of scope — the fetcher's frontier
    * records absolute URLs), reduce both ends to canonical hosts
    * ([[url_host]]), and count link multiplicity per (src, dst) edge.
    *
    * Plan: one map-only extract/explode pass, then a single map-side-
    * combined shuffle on the edge key — linear in total links at any
    * corpus size. Hosts, not full URLs, keep the edge key space bounded
    * by the site count rather than the page count. */
  def linkGraph(df: DataFrame, srcUrl: Column, html: Column): DataFrame =
    df.select(srcUrl.as("src_url"),
        explode(href_targets(html)).as("dst_url"))
      .where(is_absolute_url(col("src_url")) &&
        is_absolute_url(col("dst_url")))
      .select(url_host(col("src_url")).as("src_host"),
        url_host(col("dst_url")).as("dst_host"))
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"))

  private val AnchorPattern =
    "(?is)<a\\b[^>]*href=[\"']([^\"']*)[\"'][^>]*>(.*?)</a>"

  /** `(href, anchor_html)` pairs of every `<a href=...>...</a>` element,
    * in document order — the raw material of anchor-text signals. Same
    * regex-grade extraction contract as [[href_targets]] (quoted href,
    * first closing `</a>` ends the element, no nesting resolution); two
    * codegen'd passes of one pattern, zipped positionally. */
  def anchor_pairs(html: Column): Column = {
    val pat = lit(AnchorPattern)
    arrays_zip(
      regexp_extract_all(html, pat, lit(1)).as("href"),
      regexp_extract_all(html, pat, lit(2)).as("anchor_html"))
  }

  /** Anchor-html → display text: inner tags stripped, whitespace
    * collapsed, trimmed. ('' when the element had no text content.) */
  def anchor_text(anchorHtml: Column): Column =
    trim(regexp_replace(regexp_replace(anchorHtml, "<[^>]*>", " "),
      "\\s+", " "))

  /** Incoming-anchor-text aggregation — the link-derived DESCRIPTION of
    * each target page (what the rest of the web calls it), the classic
    * relevance/quality signal a crawl pipeline attaches to a document
    * before ranking or curation. Extract every (href, anchor) pair,
    * keep absolute src and dst with non-empty cleaned anchor text,
    * canonicalize the target ([[canonical_url]] — variants of one page
    * pool their anchors), count per (target, anchor), and keep each
    * target's top-`k` anchors (count desc, anchor asc tiebreak).
    *
    * Plan shape at crawl scale: one map-only extract/explode/clean pass,
    * a map-side-combined shuffle on (dst_url, anchor), then the grouped
    * top-k window repartitions only the already-aggregated pair counts —
    * the per-key row set entering the window is bounded by each page's
    * DISTINCT anchor vocabulary, never its raw in-degree, so a
    * 10⁸-inlink hub with 10³ distinct anchor strings costs 10³ window
    * rows. No collect_set of unbounded anchor lists anywhere. */
  /** Per-document link-quality features — the C4/Gopher-family signal
    * that separates navigation/link-farm/machine-generated pages from
    * prose: total `<a>` links, external links (absolute target whose
    * canonical host differs from the page's own), total cleaned
    * anchor-text chars, anchor-chars-per-html-char density, and the
    * external-link fraction (1e-6 fixed point, zero-link guard — the
    * [[graft.operators.Corpus]] quality-stats conventions).
    *
    * Entirely map-only: the anchor array is folded per row with array
    * HOFs (`filter`/`aggregate` over the extracted pairs) — no explode,
    * no shuffle, one codegen'd pass per page at any corpus size. */
  def linkDensityFeatures(df: DataFrame, docId: Column, srcUrl: Column,
      html: Column): DataFrame = {
    val pairs = anchor_pairs(html)
    val srcHost = url_host(srcUrl)
    val nLinks = size(pairs)
    val nExternal = size(filter(pairs, p =>
      is_absolute_url(p.getField("href")) &&
        url_host(p.getField("href")) =!= srcHost))
    val anchorChars = aggregate(pairs, lit(0), (acc, p) =>
      acc + length(anchor_text(p.getField("anchor_html"))))
    val fix6 = (c: Column) => floor(c * 1000000 + 0.5) / 1000000.0
    df.select(docId.as("doc_id"),
      nLinks.cast("long").as("n_links"),
      nExternal.cast("long").as("n_external"),
      anchorChars.cast("long").as("anchor_chars"),
      fix6(anchorChars.cast("double") / length(html)).as("link_density"),
      when(nLinks === 0, lit(0.0))
        .otherwise(fix6(nExternal.cast("double") / nLinks))
        .as("ext_ratio"))
  }

  def anchorTextTopK(df: DataFrame, srcUrl: Column, html: Column,
      k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dst_url")
      .orderBy(col("n_anchors").desc, col("anchor"))
    df.select(srcUrl.as("src_url"), explode(anchor_pairs(html)).as("p"))
      .select(col("src_url"), col("p.href").as("dst_raw"),
        anchor_text(col("p.anchor_html")).as("anchor"))
      .where(is_absolute_url(col("src_url")) &&
        is_absolute_url(col("dst_raw")) && col("anchor") =!= "")
      .groupBy(canonical_url(col("dst_raw")).as("dst_url"), col("anchor"))
      .agg(count(lit(1)).as("n_anchors"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }
}
