package graft.ops

import graft.SparkTestBase

class MmrRerankSpec extends SparkTestBase {
  import spark.implicits._

  // q points along axis 0; a/b near-duplicates of each other highly
  // relevant; c slightly less relevant but orthogonal direction mix;
  // d distinct again
  private val q = Array(1f, 0f, 0f, 0f)
  private lazy val df = Seq(
    (1L, Array(0.99f, 0.1f, 0f, 0f)), // a: rel ~.995
    (2L, Array(0.98f, 0.11f, 0f, 0f)), // b: near-dup of a
    (3L, Array(0.8f, 0f, 0.6f, 0f)), // c: rel .8, diverse
    (4L, Array(0.7f, 0f, 0f, 0.7f)), // d: rel .71, diverse
    (5L, Array(0f, 1f, 0f, 0f)) // e: irrelevant
  ).toDF("id", "vec")

  test("lambda=1 reduces to pure relevance order") {
    val out = MmrRerank.rerank(df, "id", "vec", q, k = 3, lambda = 1.0, fetchN = 5)
      .select("rank", "id").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L))
  }

  test("diversity term demotes the near-duplicate") {
    val out = MmrRerank.rerank(df, "id", "vec", q, k = 3, lambda = 0.5, fetchN = 5)
      .select("rank", "id").as[(Long, Long)].collect().sortBy(_._1)
    // first pick is still the most relevant; the near-dup (2) must NOT
    // be second — a diverse candidate wins
    assert(out(0)._2 == 1L)
    assert(out(1)._2 != 2L, s"near-dup picked second: ${out.toSeq}")
    assert(out.map(_._2).distinct.length == 3)
  }

  test("k capped by candidate count; rel column rounded") {
    val out = MmrRerank.rerank(df, "id", "vec", q, k = 10, lambda = 0.7, fetchN = 10)
    assert(out.count() == 5)
    val rels = out.select("rel").as[Double].collect()
    assert(rels.forall(r => (math.abs(r * 1e4 - math.rint(r * 1e4)) < 1e-9)))
  }
}
