package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UrlAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "read https://News.Example.com/a and http://ads.tracker.net/px?id=1 now"),
    (2L, "same host twice https://a.org/x https://a.org/y"),
    (3L, "no urls at all in this text"),
    (4L, "scheme-less www.example.com is not extracted"),
    (5L, "bare https://apex.net and sub https://deep.sub.apex.net/q"))
    .toDF("doc_id", "t")

  test("extractUrls / domains: count, normalization, distinct, sorted") {
    val got = docs.select(
      $"doc_id",
      size(UrlAnalysis.extractUrls($"t")).as("n"),
      UrlAnalysis.domains($"t").as("d"))
      .as[(Long, Int, Seq[String])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((2, Seq("ads.tracker.net", "news.example.com"))))
    assert(got(2L) == ((2, Seq("a.org")))) // distinct hosts
    assert(got(3L) == ((0, Seq())))
    assert(got(4L) == ((0, Seq()))) // http(s) scheme required
    assert(got(5L) == ((2, Seq("apex.net", "deep.sub.apex.net"))))
  }

  test("hasBlockedDomain: exact and subdomain matches, case-insensitive") {
    val blocked = Seq("Tracker.NET", "apex.net")
    val got = docs.select(
      $"doc_id", UrlAnalysis.hasBlockedDomain($"t", blocked).as("b"))
      .as[(Long, Boolean)].collect().toMap
    assert(got(1L)) // ads.tracker.net is a subdomain of tracker.net
    assert(!got(2L) && !got(3L) && !got(4L))
    assert(got(5L)) // apex.net exact + deep.sub.apex.net subdomain
  }

  test("scheme case and userinfo cannot evade the blocklist") {
    val tricky = Seq(
      (1L, "loud HTTPS://Blocked.com/x scheme"),
      (2L, "creds http://foo:pw@blocked.com/y inside"),
      (3L, "both HTTP://a:b@sub.Blocked.COM/z"),
      (4L, "sentence-final https://blocked.com. next sentence"),
      (5L, "comma https://blocked.com, then more"),
      (6L, "double-at http://a@@blocked.com/x evasion"),
      (7L, "at-in-password http://u:p@ss@blocked.com/y too"))
      .toDF("doc_id", "t")
    val got = tricky.select(
      $"doc_id",
      UrlAnalysis.domains($"t").as("d"),
      UrlAnalysis.hasBlockedDomain($"t", Seq("blocked.com")).as("b"))
      .as[(Long, Seq[String], Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == Seq("blocked.com") && got(1L)._3)
    assert(got(2L)._2 == Seq("blocked.com") && got(2L)._3) // userinfo stripped
    assert(got(3L)._2 == Seq("sub.blocked.com") && got(3L)._3)
    // trailing sentence punctuation is not part of the host
    assert(got(4L)._2 == Seq("blocked.com") && got(4L)._3)
    assert(got(5L)._2 == Seq("blocked.com") && got(5L)._3)
    // browsers split userinfo at the LAST '@' — a first-'@' split
    // would capture host '@blocked.com' and slip past the blocklist
    assert(got(6L)._2 == Seq("blocked.com") && got(6L)._3)
    assert(got(7L)._2 == Seq("blocked.com") && got(7L)._3)
  }

  test("empty blocklist blocks nothing (and does not crash)") {
    val got = docs.select(
      UrlAnalysis.hasBlockedDomain($"t", Seq.empty).as("b"))
      .as[Boolean].collect()
    assert(got.forall(_ == false))
  }

  test("domainCounts aggregates per distinct host per doc") {
    val counts = UrlAnalysis.domainCounts(docs, "t")
      .as[(String, Long)].collect().toMap
    assert(counts("a.org") == 1) // two urls, one doc → 1
    assert(counts("apex.net") == 1)
    assert(counts.values.sum == 5) // 5 distinct (doc, domain) pairs
  }

  test("canonicalUrl: case, userinfo, ports, trackers, slash, fragment") {
    val cases = Seq(
      // classic messy crawl duplicates of http://example.com/x
      ("HTTP://WWW.Example.COM:80/x/?utm_source=f#top", "http://example.com/x"),
      ("http://user:pw@example.com/x", "http://example.com/x"),
      // non-default port and real params survive, trackers drop
      ("https://Shop.org:8443/a?id=3&utm_campaign=z&b=2&gclid=q",
        "https://shop.org:8443/a?id=3&b=2"),
      // default https port strips; root path with trailing slashes trims
      ("https://a.b.c:443///", "https://a.b.c"),
      // only trackers → no query part at all
      ("http://e.com/p?utm_a=1&fbclid=2", "http://e.com/p"),
      // non-URL input is passed through untouched
      ("not a url", "not a url"))
    val got = cases.map(_._1).toDF("u")
      .select(UrlAnalysis.canonicalUrl($"u").as("c"))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }
}
