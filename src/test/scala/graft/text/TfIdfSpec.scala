package graft.text

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TfIdfSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "apple banana apple"),   // identical to 1
    (3L, "cherry durian elder"),
    (4L, "apple cherry"),
    (5L, null.asInstanceOf[String]),
    (6L, "   ")
  ).toDF("doc_id", "text")

  test("weights are L2-normalized and sparse; null/token-free docs absent") {
    val w = TfIdf.hashedWeights(corpus, "doc_id", "text", dim = 512)
    val norms = w.groupBy("doc_id").agg(sum(col("weight") * col("weight")).as("n2"))
      .as[(Long, Double)].collect().toMap
    assert(norms.keySet == Set(1L, 2L, 3L, 4L))
    norms.values.foreach(n2 => assert(math.abs(n2 - 1.0) < 1e-9))
    // identical docs → identical sparse rows
    val w1 = w.where($"doc_id" === 1).select("bucket", "weight")
      .orderBy("bucket").collect().toSeq
    val w2 = w.where($"doc_id" === 2).select("bucket", "weight")
      .orderBy("bucket").collect().toSeq
    assert(w1 == w2 && w1.nonEmpty)
  }

  test("similarity join: identical docs sim 1, disjoint docs absent, hub pruning drops shared buckets") {
    val w = TfIdf.hashedWeights(corpus, "doc_id", "text", dim = 512)
    val sims = TfIdf.similarityJoin(w, "doc_id", minSim = 0.0, maxDfRatio = 1.0)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    assert(math.abs(sims((1L, 2L)) - 1.0) < 1e-9)
    assert(!sims.contains((1L, 3L))) // no shared bucket
    assert(sims((1L, 4L)) > 0.0)     // shares 'apple'

    // 'apple' appears in 3 of 4 docs → dropped at maxDfRatio 0.5, so
    // 1-4 (apple-only overlap) disappears while 1-2 keeps banana
    val pruned = TfIdf.similarityJoin(w, "doc_id", minSim = 0.0, maxDfRatio = 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    assert(!pruned.contains((1L, 4L)))
    assert(pruned.contains((1L, 2L)))
  }
}
