package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val L = 10

  test("duplicated windows: canonical first site kept, later sites marked") {
    // doc 1 and doc 2 share a 20-char region; doc 3 is clean
    val shared = "ABCDEFGHIJKLMNOPQRST" // 20 chars
    val docs = Seq(
      (1L, s"xx${shared}yyyyyyyyyy"),
      (2L, s"zzzzz${shared}wwwww"),
      (3L, "completely unique text with no repeats at all!")
    ).toDF("doc_id", "text")
    val wins = SubstringDedup.duplicatedWindows(docs, "doc_id", "text", L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    // 11 shared windows per doc (20-10+1), doc 1 canonical for all
    assert(wins.count(_._3) == 11)
    assert(wins.filter(_._3).forall(_._1 == 1L))
    assert(wins.count(w => !w._3 && w._1 == 2L) == 11)
    assert(!wins.exists(_._1 == 3L))
  }

  test("spans merge overlapping and adjacent windows; doc offsets correct") {
    val shared = "ABCDEFGHIJKLMNOPQRST"
    val docs = Seq(
      (1L, s"xx${shared}yyyyyyyyyy"),
      (2L, s"zzzzz${shared}wwwww")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "doc_id", "text", L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // all doc-2 windows coalesce into one span covering the shared
    // region at its offset (starts at char 6, 1-based)
    assert(spans.toSeq == Seq((2L, 6L, 25L)))
  }

  test("removeDuplicated cuts spans, keeps canonical doc intact") {
    val shared = "ABCDEFGHIJKLMNOPQRST"
    val d1 = s"xx${shared}yyyyyyyyyy"
    val d2 = s"zzzzz${shared}wwwww"
    val docs = Seq((1L, d1), (2L, d2), (3L, "short")).toDF("doc_id", "text")
    val out = SubstringDedup.removeDuplicated(docs, "doc_id", "text", L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) == d1)
    assert(out(2L) == "zzzzzwwwww")
    assert(out(3L) == "short")
  }

  test("intra-doc repetition: second occurrence in the SAME doc removed") {
    val rep = "0123456789" * 2 // 20 chars, self-repeating
    val docs = Seq((7L, s"$rep--------$rep")).toDF("doc_id", "text")
    val out = SubstringDedup.removeDuplicated(docs, "doc_id", "text", L)
      .head().getString(1)
    // the first window of the first copy is canonical; everything the
    // later duplicated windows cover is cut
    assert(out.length < rep.length * 2 + 8)
    assert(out.startsWith("0123456789"))
  }

  test("narrow pass plan: no text column in the hash-agg exchange") {
    val docs = Seq((1L, "abcdefghijklmnop"), (2L, "abcdefghijklmnop"))
      .toDF("doc_id", "text")
    val plan = SubstringDedup
      .duplicatedWindows(docs, "doc_id", "text", L)
      .queryExecution.optimizedPlan.toString
    // the aggregate feeding the dup-hash set projects the 8-byte
    // rolling hash only — gram text never reaches an exchange
    assert(plan.contains("rolling_hashes"))
  }
}
