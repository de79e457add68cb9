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

  test("domainCounts aggregates per distinct host per doc") {
    val counts = UrlAnalysis.domainCounts(docs, "t")
      .as[(String, Long)].collect().toMap
    assert(counts("a.org") == 1) // two urls, one doc → 1
    assert(counts("apex.net") == 1)
    assert(counts.values.sum == 5) // 5 distinct (doc, domain) pairs
  }
}
