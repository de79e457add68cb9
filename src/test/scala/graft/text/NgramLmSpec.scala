package graft.text

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  test("charNgramCounts: hand-checked trigrams") {
    val docs = Seq((1L, "abab"), (2L, "ab")).toDF("doc_id", "text")
    val c3 = NgramLm.charNgramCounts(docs, "doc_id", "text", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c3 == Map("aba" -> 1L, "bab" -> 1L)) // doc 2 too short
    val c2 = NgramLm.charNgramCounts(docs, "doc_id", "text", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c2 == Map("ab" -> 3L, "ba" -> 1L))
  }

  test("perplexityBits: repetitive text scores lower than random text") {
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat on the mat the cat sat"),
      (2L, "qz7#kP!mW9@xR2&vL5^jN8*bT4%hF6$gD3(sA1)eC0-yU"),
      (3L, "the cat sat on the mat again and again and again and again")
    ).toDF("doc_id", "text")
    val ppl = NgramLm.perplexityBits(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppl.size == 3)
    assert(ppl(1L) < ppl(2L), s"natural $ppl")
    assert(ppl(3L) < ppl(2L), s"natural $ppl")
    assert(ppl.values.forall(v => v > 0 && v.isFinite))
  }

  test("perplexityBits exact hand computation on a two-char alphabet") {
    // corpus "aaab": trigrams aaa, aab; bigrams aa(×2), ab; V = 2
    val docs = Seq((9L, "aaab")).toDF("doc_id", "text")
    val got = NgramLm.perplexityBits(docs, "doc_id", "text")
      .head().getDouble(1)
    val pAaa = (1 + 0.5) / (2 + 0.5 * 2) // ctx aa
    val pAab = (1 + 0.5) / (2 + 0.5 * 2) // ctx aa
    val want = -(math.log(pAaa) / math.log(2) + math.log(pAab) / math.log(2)) / 2
    assert(math.abs(got - (math.rint(want * 1e4) / 1e4)) < 1e-9, s"$got vs $want")
  }

  test("broadcast conf: disabling the hint preserves results") {
    val docs = Seq((1L, "abcabcabc"), (2L, "xyzxyzxyz")).toDF("doc_id", "text")
    val a = NgramLm.perplexityBits(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    spark.conf.set("spark.graft.lm.broadcast", "false")
    try {
      val b = NgramLm.perplexityBits(docs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      assert(a == b)
    } finally spark.conf.unset("spark.graft.lm.broadcast")
  }

  test("topNgrams: deterministic count-desc gram-asc order, n=1 and n=3") {
    val docs = Seq(
      (1L, "big data big data big"),
      (2L, "data big data")
    ).toDF("doc_id", "text")
    val uni = NgramLm.topNgrams(docs, "text", 1, 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(uni.toSeq == Seq(("big", 4L), ("data", 4L))) // tie → asc gram
    val tri = NgramLm.topNgrams(docs, "text", 3, 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(tri("big data big") == 2L)
    assert(tri("data big data") == 2L)
  }

  test("topNgrams: docs shorter than n contribute nothing") {
    val docs = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val tri = NgramLm.topNgrams(docs, "text", 3, 10).collect()
    assert(tri.isEmpty)
  }
}
