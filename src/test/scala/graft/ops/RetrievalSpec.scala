package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Hand-computed cases for the retrieval-composition operators:
  * reciprocal-rank fusion and the IR quality metrics. */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  test("rrf: hand-computed fusion, absent ids contribute nothing") {
    // list A ranks: x=1, y=2; list B ranks: y=1, z=2
    val a = Seq(("x", 1), ("y", 2)).toDF("id", "rank")
    val b = Seq(("y", 1), ("z", 2)).toDF("id", "rank")
    val out = HybridSearch.rrf(Seq(a, b), n = 3, k0 = 60)
      .as[(String, Double)].collect().toMap
    assert(math.abs(out("y") - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(out("x") == 1.0 / 61 && out("z") == 1.0 / 62)
    // y (two lists) outranks x and z (one each); x (rank 1) beats z (rank 2)
    val order = HybridSearch.rrf(Seq(a, b), 3).select("id").as[String].collect()
    assert(order.toSeq == Seq("y", "x", "z"))
  }

  test("ranked: 1-based ranks under the declared total order") {
    val df = Seq((5L, 0.3), (7L, 0.1), (9L, 0.2)).toDF("doc", "score")
    val r = HybridSearch.ranked(df, "doc", Seq($"score", $"doc"))
      .as[(Long, Int)].collect().toMap
    assert(r == Map(7L -> 1, 9L -> 2, 5L -> 3))
  }

  test("rank metrics: hand-computed recall, mrr, ndcg") {
    // query 1: top-3 = (a,1)(b,2)(c,3); relevant: b(rel 2), c(rel 1),
    //   d(rel 2) — d missed. query 2: no relevant docs at all.
    val results = Seq(
      (1L, "a", 1), (1L, "b", 2), (1L, "c", 3),
      (2L, "a", 1), (2L, "b", 2)).toDF("query_id", "doc_id", "rank")
    val judgments = Seq(
      (1L, "b", 2), (1L, "c", 1), (1L, "d", 2)).toDF("query_id", "doc_id", "rel")
    val m = RankMetrics.evaluate(results, judgments, k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    val d = RankMetrics.discounts(3)
    assert(m(1L).getLong(1) == 3 && m(1L).getLong(2) == 2)
    assert(math.abs(m(1L).getDouble(3) - 2.0 / 3) < 1e-15) // recall
    assert(m(1L).getDouble(4) == 0.5) // first relevant at rank 2
    // dcg = 3·disc(2) + 1·disc(3); idcg = ideal order b,d,c = 3·d1 + 3·d2 + 1·d3
    val dcg = 3 * d(1) + 1 * d(2)
    val idcg = 3 * d(0) + 3 * d(1) + 1 * d(2)
    assert(math.abs(m(1L).getDouble(5) - dcg / idcg) < 1e-15)
    // no judgments → all-zero metrics, not nulls
    assert(m(2L).getLong(1) == 0 && m(2L).getDouble(3) == 0.0 &&
      m(2L).getDouble(4) == 0.0 && m(2L).getDouble(5) == 0.0)
  }
}
