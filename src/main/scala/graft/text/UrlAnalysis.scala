package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain analysis for web-scraped training corpora: extract
  * URLs, normalize to registrable host, filter by domain blocklist,
  * and aggregate per-domain corpus stats — the standard provenance
  * filtering step (C4 drops blocklisted domains; Dolma/RefinedWeb
  * score by source domain). Not in the reference engine; part of the
  * pipeline surface.
  *
  * Patterns are restricted to syntax with identical semantics in Java
  * regex and RE2 (same policy as [[TextAnalysis.Pii]]) so the driver
  * gate replays them verbatim in DuckDB. Everything except
  * [[domainCounts]] is pure codegen'd map-side built-ins — no shuffle,
  * no UDFs; domainCounts is one partial-aggregated groupBy on a
  * low-cardinality key.
  */
object UrlAnalysis {

  /** http(s) URLs, scheme case-insensitive (RFC 3986 §3.1 — `HTTP://`
    * is the same scheme; a case-sensitive match would be a blocklist
    * evasion vector): scheme + everything up to
    * whitespace/quote/angle (trailing punctuation intentionally
    * included — exact boundary trimming differs per pipeline; callers
    * can strip). `(?i:...)` parses identically in Java regex and RE2. */
  val UrlPattern = "(?i:https?)://[^\\s\"'<>]+"

  /** Host part of a URL (group 1): after the scheme and optional
    * userinfo (`user:pass@` — RFC 3986 §3.2.1; without stripping it,
    * `http://foo@blocked.com` would report host `foo@blocked.com` and
    * slip past blocklists), up to the first `/ : ? #`. The userinfo
    * class allows '@' so the group consumes through the LAST '@'
    * before the host — browsers treat the last '@' as the userinfo
    * delimiter, so `http://a@@blocked.com` navigates to `blocked.com`
    * and a first-'@' split would report host `@blocked.com` and slip
    * past the blocklist. The captured host must END with an
    * alphanumeric, so the sentence punctuation [[UrlPattern]]
    * deliberately keeps ('https://blocked.com.' at end of sentence)
    * cannot leave a trailing '.' that defeats blocklist equality —
    * another evasion vector. */
  val HostPattern = "^(?i:https?)://(?:[^/?#]*@)?([^/:?#]*[A-Za-z0-9])"

  /** All URLs in `text` as array<string> (empty when none). */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlPattern), lit(0))

  /** Lowercased host of a single URL ('' for non-URLs). */
  def domainOf(url: Column): Column =
    lower(regexp_extract(url, HostPattern, 1))

  /** Distinct lowercased hosts mentioned in `text`, sorted
    * (deterministic for hashing/oracles). Degenerate URLs with no
    * alphanumeric host ('https://...') extract as '' and are
    * dropped. */
  def domains(text: Column): Column =
    sort_array(array_distinct(filter(
      transform(extractUrls(text), domainOf(_)), _ =!= "")))

  /** Canonical form of a single URL — the dedup key web-corpus
    * pipelines group on (a page crawled as `HTTP://WWW.A.COM:80/x/?
    * utm_source=f#top` and `http://a.com/x` is ONE page):
    * scheme/host lowercased, userinfo and fragment dropped, `www.`
    * prefix and scheme-default ports stripped, trailing path slashes
    * trimmed, tracking query params (`utm_*`, `gclid`, `fbclid`)
    * removed with the remaining params kept in page-given order.
    * Non-URL input passes through unchanged so the column is total.
    *
    * Pure Column composition over regex built-ins, all patterns inside
    * the Java∩RE2 subset (no lookaround) — SQL-replayable and
    * engine-portable, one map-side projection at any scale. */
  /** Full-URL parse (groups: scheme, userinfo, host, port, path,
    * query) and the tracking-param prefix — public so the oracle SQL
    * interpolates the SAME patterns (one source of truth). */
  val UrlParsePattern: String =
    "^([A-Za-z][A-Za-z0-9+.-]*)://(?:([^/@?#]*)@)?([^/:?#]+)" +
      "(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"
  val TrackerParamPattern: String = "^(utm_[A-Za-z0-9_]*|gclid|fbclid)="

  def canonicalUrl(url: Column): Column = {
    val re = UrlParsePattern
    val scheme = lower(regexp_extract(url, re, 1))
    val host = regexp_replace(lower(regexp_extract(url, re, 3)), "^www\\.", "")
    val port = regexp_extract(url, re, 4)
    val path = regexp_replace(regexp_extract(url, re, 5), "/+$", "")
    val query = regexp_extract(url, re, 6)
    val keptQ = array_join(
      filter(split(query, "&"),
        p => !p.rlike(TrackerParamPattern) && p =!= lit("")),
      "&")
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"),
      lit("")).otherwise(concat(lit(":"), port))
    val qPart = when(keptQ === "", lit(""))
      .otherwise(concat(lit("?"), keptQ))
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), host, portPart, path, qPart))
  }

  /** True when any mentioned host equals a blocked domain or is a
    * subdomain of one (`ads.example.com` matches blocked
    * `example.com`). The blocklist is inlined into the expression —
    * right for curated lists (tens to hundreds of entries); for
    * UT1-scale blocklists (millions) join [[domainCounts]]' key
    * against a blocklist table or probe a broadcast set
    * ([[graft.ops.CountInBroadcastSet]] pattern) instead. */
  def hasBlockedDomain(text: Column, blocked: Seq[String]): Column = {
    val b = blocked.map(_.toLowerCase)
    // foldLeft, not reduce: an empty blocklist means "nothing blocked",
    // not an empty.reduce crash
    exists(domains(text), d =>
      b.foldLeft(lit(false))((acc, x) =>
        acc || d === x || d.endsWith("." + x)))
  }

  /** Per-domain document counts over the corpus, descending — the
    * source-distribution profile used for domain-level sampling
    * decisions. One explode + one partial-aggregated groupBy on the
    * domain key. */
  def domainCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(domains(col(textCol))).as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("domain"))
}
