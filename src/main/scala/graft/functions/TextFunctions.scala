package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, deterministic string hashing, shingling, language-ID
  * scoring, quality scoring, and fingerprinting.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs) and each primitive has an exact ANSI-SQL twin used by the
  * DuckDB oracles, so results are engine-independent and reproducible.
  */
object TextFunctions {

  /** Large prime for polynomial rolling hashes; small enough that
    * h*31 + 127 never overflows a signed 64-bit integer. */
  val HashPrime: Long = 1000000007L
  val HashMult1 = 31L

  /** Whitespace tokens (split on runs of whitespace, drop empties). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Polynomial rolling hash of a string column:
    * fold (h, c) -> (h*mult + ascii(c)) % HashPrime over the characters.
    * Deterministic and exactly reproducible in DuckDB via list_reduce.
    * Backed by the codegen'd native expression [[PolyHash]] (the built-in
    * HOF composition is interpreted and allocates per character). */
  def polyHash(s: Column, mult: Long = HashMult1): Column =
    PolyHash.poly_hash(s, mult)

  /** 60-bit token hash: two independent polynomial hashes (mults 31 and
    * 131, both mod [[HashPrime]] < 2^30) packed as hi·2^30 + lo. A
    * 64-bit-grade fingerprint space that stays EXACTLY reproducible in
    * DuckDB BIGINT arithmetic — the twin's fold (h*131 + c) % p peaks
    * below 2^37, nowhere near overflow, whereas a true single 64-bit
    * polynomial hash would need a ~2^57 modulus whose fold overflows
    * the oracle's signed multiply. Non-negative by construction, so
    * signed bit extraction (h >> i) % 2 agrees between engines for all
    * 60 bits. Feeds [[graft.operators.Dedup.simHashDocs]]'s wide
    * configuration (the production SimHash width — 16-bit spaces
    * saturate at ~10^5 docs). */
  def wideTokenHash(s: Column): Column =
    polyHash(s, HashMult1) * lit(1L << 30) + polyHash(s, 131L)

  /** Word n-gram shingles of a token array: array of space-joined n-grams.
    * Empty when there are fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature (as array<long>) over a shingle-hash array using the
    * affine family h_j(x) = (a_j*x + b_j) mod HashPrime with
    * a_j = 2j+1, b_j = j²+7919 — the native one-pass expression
    * ([[MinHashSig]]; the composed array_min/transform form evaluates k
    * interpreted HOFs and allocates k arrays per doc; results identical). */
  def minHashSignature(shingleHashes: Column, numHashes: Int): Column =
    MinHashSig.min_hash_signature(shingleHashes, numHashes)

  /** English stopwords used by the quality score (public, standard list). */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "in", "on", "to", "is", "are", "was",
    "be", "it", "that", "this", "for", "with", "as", "at", "by", "from")

  /** Marker-token sets for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une"),
    "es" -> Seq("el", "los", "las", "de", "y", "un", "una"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我"))

  /** Count of tokens that belong to a marker vocabulary — the native
    * codegen'd loop ([[TokenExprs.marker_count]]); identical results to
    * the size(filter(isin)) HOF form it replaces on NON-NULL arrays,
    * which is interpreted and allocates a filtered array per evaluation
    * (language-ID pays that once per language per row). NULL-array
    * divergence: this returns NULL, while the old form returned whatever
    * `size(NULL)` is under `spark.sql.legacy.sizeOfNull` (-1 when the
    * legacy flag is on). No graft path feeds a null array (tokens() of
    * corpus text is never null), but direct callers on nullable arrays
    * should guard with coalesce if they relied on the -1 convention. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    TokenExprs.marker_count(toks, markers)

  /** Composite quality score in [0,1] from a token-array ATTRIBUTE
    * (pass a staged column): 0.4·min(1, n/100) + 0.3·stopword-ratio +
    * 0.3·min(1, avgTokenLen/8). A zero-token document scores 0.0 exactly
    * (the unguarded ratios would be 0/0 = NaN, which engines round/collapse
    * differently — the oracle SQL carries the same CASE guard). */
  def qualityScore(toks: Column): Column = {
    val nTok = size(toks).cast("double")
    val avgLen = TokenExprs.token_length_sum(toks) / nTok
    val stopRatio = markerCount(toks, EnglishStopwords).cast("double") / nTok
    when(size(toks) === 0, lit(0.0)).otherwise(
      least(nTok / 100.0, lit(1.0)) * 0.4 + stopRatio * 0.3 +
        least(avgLen / 8.0, lit(1.0)) * 0.3)
  }

  /** Language prediction from a token-array ATTRIBUTE: the first language
    * (in fixed code order) whose marker count >= every later language's. */
  def langPredict(toks: Column): Column = {
    val order = LangMarkers.keys.toSeq.sorted
    val counts = order.map(l => l -> markerCount(toks, LangMarkers(l)))
    order.indices.init.foldRight(lit(order.last)) { (i, els) =>
      val (l, c) = counts(i)
      val laters = counts.drop(i + 1).map(_._2)
      when(laters.map(c >= _).reduce(_ && _), lit(l)).otherwise(els)
    }
  }

  /** PII patterns, applied in order (emails first — once replaced, their
    * digit/dot runs can't be re-matched by the later patterns). Kept to
    * the regex subset Java and RE2 interpret identically (char classes,
    * bounded repetition, \b; no backrefs or lookaround), so the DuckDB
    * oracles share the patterns verbatim. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("EMAIL", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("IPV4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"),
    ("LONGNUM", "\\b[0-9]{9,}\\b"))

  /** Redact PII in place: each pattern class becomes its `<NAME>` tag.
    * Pure regexp_replace chain — codegen'd, no UDF. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (name, p)) =>
      regexp_replace(c, p, s"<$name>")
    }

  /** Keyed deterministic pseudonymization of an identifier column: the
    * value becomes the opaque token `pid_<polyhash(secret:value)>`.
    * Deterministic per (secret, value), so the SAME secret applied
    * across tables keeps joins and group-bys working on the pseudonyms
    * — the standard privacy-preserving-identifier technique for
    * training corpora (complement of [[redactPii]]: redaction removes
    * free-text PII, pseudonymization replaces join KEYS). Per-row
    * codegen'd hash, map-only; rotate the secret to unlink releases.
    * (The rolling hash is collision-plausible but preimage-hard enough
    * only against casual inspection — treat the secret, not the hash
    * width, as the protection boundary, and keep raw keys out of the
    * published frame entirely.) */
  def pseudonymize(c: Column, secret: String): Column =
    concat(lit("pid_"),
      PolyHash.poly_hash(concat(lit(secret), lit(":"), c.cast("string"))))

  /** Total PII matches across the pattern classes, counted in the same
    * order redaction applies them (on the progressively redacted text, so
    * an email's host digits are not double-counted as a number). */
  def piiCount(text: Column): Column = {
    val (total, _) = PiiPatterns.foldLeft((lit(0).cast("int"), text)) {
      case ((cnt, cur), (name, p)) =>
        (cnt + size(regexp_extract_all(cur, lit(p), lit(0))),
          regexp_replace(cur, p, s"<$name>"))
    }
    total
  }
}
