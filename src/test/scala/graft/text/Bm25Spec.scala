package graft.text

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions._

/** BM25 over the reference's 4-doc golden corpus
  * (lantern_extras/src/bm25_agg.rs:586-700).
  */
class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana orange"),
    (2L, "apple apple banana"),
    (3L, "banana banana orange"),
    (4L, "kiwi pineapple banana"))
    .toDF("doc_id", "content")
    .select($"doc_id", text_to_stem_array($"content").as("terms"))

  private lazy val inv = Bm25.createBm25Table(docs, "doc_id", "terms")

  test("inverted table structure: term rows + stats row") {
    val terms = inv.where($"term".isNotNull)
      .select("term", "term_freq", "doc_ids", "fqs", "doc_lens")
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getSeq[Long](2), r.getSeq[Int](3), r.getSeq[Int](4)))
      .toMap
    // stem: apple→appl, banana→banana, orange→orang, kiwi→kiwi, pineapple→pineappl
    assert(terms("banana") == (4, Seq(1L, 2L, 3L, 4L), Seq(1, 1, 2, 1), Seq(3, 3, 3, 3)))
    assert(terms("appl") == (2, Seq(1L, 2L), Seq(1, 2), Seq(3, 3)))
    assert(terms("orang")._1 == 2)
    val stats = inv.where($"term".isNull).head()
    assert(stats.getAs[Int]("term_freq") == 4)     // corpus size
    assert(stats.getAs[Int]("doc_ids_len") == 300) // avgdl*100
    assert(stats.getAs[Double]("avg_doc_len") == 3.0)
  }

  test("golden: doc 2 ranks highest for 'apple banana' and scores match formula") {
    val got = Bm25.searchBm25(inv, Seq("appl", "banana"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.head._1 == 2L, s"expected doc 2 first, got ${got.toSeq}")
    assert(got.forall(_._2 > 0.0))

    // independent hand computation, N=4, avgdl=3
    def score(fq: Double, len: Double, df: Double): Double =
      Bm25.termScoreScala(fq, len, df, 4L, 3.0, 1.2, 0.75)
    val expected = Map(
      1L -> (score(1, 3, 2) + score(1, 3, 4)),
      2L -> (score(2, 3, 2) + score(1, 3, 4)),
      3L -> score(2, 3, 4),
      4L -> score(1, 3, 4))
    got.foreach { case (id, s) =>
      assert(math.abs(s - expected(id)) < 1e-9, s"doc $id")
    }
    // all 4 docs contain a query term
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("searchText end-to-end (raw text query)") {
    val raw = Seq(
      (1L, "apple banana orange"), (2L, "apple apple banana"),
      (3L, "banana banana orange"), (4L, "kiwi pineapple banana"))
      .toDF("doc_id", "content")
    val hits = Bm25.searchText(raw, "doc_id", "content", "apple banana", 2)
      .collect()
    assert(hits.length == 2 && hits.head.getLong(0) == 2L)
  }

  test("bloom approximation path: common terms score fq=1/len=avgdl for bloom'd candidates") {
    // threshold 3 → 'banana' (df=4) goes to bloom
    val inv2 = Bm25.createBm25Table(docs, "doc_id", "terms", bloomThreshold = 3)
    assert(inv2.where($"term" === "banana").head()
      .getAs[Array[Byte]]("doc_ids_bloom") != null)
    val got = Bm25.searchBm25(inv2, Seq("appl", "banana"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    def score(fq: Double, len: Double, df: Double): Double =
      Bm25.termScoreScala(fq, len, df, 4L, 3.0, 1.2, 0.75)
    // only docs 1,2 are candidates (from 'appl'); banana adds fq=1 bonus
    assert(got.keySet == Set(1L, 2L))
    assert(math.abs(got(1L) - (score(1, 3, 2) + score(1, 3, 4))) < 1e-9)
    assert(math.abs(got(2L) - (score(2, 3, 2) + score(1, 3, 4))) < 1e-9)
  }

  test("consolidate merges duplicate term rows AND corpus stats (weighted)") {
    val extra = Bm25.createBm25Table(
      Seq((9L, Seq("banana"))).toDF("doc_id", "terms"), "doc_id", "terms")
    val merged = Bm25.consolidate(inv.unionByName(extra))
    val banana = merged.where($"term" === "banana").head()
    assert(banana.getAs[Int]("term_freq") == 5)
    assert(banana.getSeq[Long](banana.fieldIndex("doc_ids")).toSeq ==
      Seq(1L, 2L, 3L, 4L, 9L))
    // stats rows merged: n = 4 + 1, avgdl = (3*4 + 1*1)/5
    val (n, avgdl) = Bm25.corpusStats(merged)
    assert(n === 5L)
    assert(math.abs(avgdl - 13.0 / 5) < 1e-12)
    assert(merged.where($"term".isNull).count() === 1)
  }

  test("consolidate preserves hot-term true df beyond the posting cap") {
    val many = (1L to 30L).map(i => (i, Seq("hot"))).toDF("doc_id", "terms")
    val inv2 = Bm25.createBm25Table(many, "doc_id", "terms", bloomThreshold = 10)
    val merged = Bm25.consolidate(inv2, bloomThreshold = 10)
    val hot = merged.where($"term" === "hot").head()
    assert(hot.getAs[Int]("term_freq") == 30,
      "true document frequency survives consolidation, not the capped sample size")
    assert(hot.getSeq[Long](hot.fieldIndex("doc_ids")).size == 10)
    assert(hot.getAs[Array[Byte]]("doc_ids_bloom") != null,
      "term stays on the bloom path after consolidation")
  }

  test("bloom filter has no false negatives") {
    val ids = (0L until 1000L by 7).toSeq
    val bytes = Bm25.bloomBytes(ids)
    assert(ids.forall(Bm25.bloomContains(bytes, _)))
  }

  test("hot-term postings are capped but df and bloom cover the full set") {
    // 50 docs all share 'hot'; 2 docs have 'rare'; threshold 10
    val many = (1L to 50L).map(i =>
      (i, if (i <= 2) Seq("hot", "rare") else Seq("hot")))
      .toDF("doc_id", "terms")
    val inv2 = Bm25.createBm25Table(many, "doc_id", "terms", bloomThreshold = 10)

    val hot = inv2.where($"term" === "hot").head()
    assert(hot.getAs[Int]("term_freq") == 50, "true df preserved")
    assert(hot.getSeq[Long](hot.fieldIndex("doc_ids")).size == 10,
      "stored postings capped at threshold")
    val bloom = hot.getAs[Array[Byte]]("doc_ids_bloom")
    assert(bloom != null)
    assert((1L to 50L).forall(Bm25.bloomContains(bloom, _)),
      "bloom covers ALL docs, not just the stored sample")

    val rare = inv2.where($"term" === "rare").head()
    assert(rare.getAs[Int]("term_freq") == 2)
    assert(rare.getAs[Array[Byte]]("doc_ids_bloom") == null)

    // mixed query still scores: rare exact + hot bonus for candidates
    val got = Bm25.searchBm25(inv2, Seq("rare", "hot"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("bm25_score single-document scorer matches the aggregate path") {
    val s = Bm25.bm25Score(inv, "apple apple banana", "apple banana")
    def score(fq: Double, len: Double, df: Double): Double =
      Bm25.termScoreScala(fq, len, df, 4L, 3.0, 1.2, 0.75)
    // doc terms: appl x2, banana x1; len 3 — identical to stored doc 2
    assert(math.abs(s - (score(2, 3, 2) + score(1, 3, 4))) < 1e-9)
    assert(Bm25.bm25Score(inv, "", "apple") == 0.0)
    assert(Bm25.bm25Score(inv, "apple", "zzz") == 0.0)
  }

  test("repeated searches leave no cache entries behind") {
    (1 to 20).foreach { _ =>
      Bm25.searchBm25(inv, Seq("appl", "banana"), 10).collect()
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "searchBm25 must not pin CacheManager entries across searches")
  }

  test("bloom cache evicts per-entry LRU, never flushes wholesale") {
    val hot = Bm25.bloomBytes(Seq(424242L))
    val hotInstance = Bm25.parsedBloom(hot)
    // push 2x the capacity of distinct filters through, re-touching the
    // hot entry each time so access ordering keeps it resident
    (1 to Bm25.BloomCacheMaxEntries * 2).foreach { i =>
      Bm25.parsedBloom(Bm25.bloomBytes(Seq(i.toLong, 1000000L + i)))
      Bm25.parsedBloom(hot)
    }
    assert(Bm25.bloomCacheSize == Bm25.BloomCacheMaxEntries,
      s"bounded at capacity, got ${Bm25.bloomCacheSize}")
    // same instance ⇒ the hot filter survived 2x-capacity churn (a
    // clear-on-full cache would have dropped and re-parsed it)
    assert(Bm25.parsedBloom(hot) eq hotInstance)
  }
}
