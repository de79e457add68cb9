package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.l2sq_dist
import graft.pq.{PqCodebook, ProductQuantizer}

/** Driver-checkable queries for product quantization (SURVEY.md §2.3).
  *
  * Two layers, mirroring how the reference tests PQ:
  *  - `pq_quantize_fixed`: nearest-centroid assignment against a FIXED
  *    literal codebook — fully deterministic, hash-verified in DuckDB.
  *  - `pq_recall_gate`: the real pipeline (k-means codebook → quantize
  *    → asymmetric-LUT search), gated on recall drop < 0.2 vs exact
  *    top-10 like the reference's own PQ test
  *    (lantern_hnsw/test/sql/hnsw_pq.sql:83-86) — k-means output is
  *    seed-dependent, so a row-hash oracle is impossible by design.
  */
object PqQueries {

  /** 64-dim: 4 subvectors × 2 centroids (const 0.0 / const 0.1). */
  private def fixedCodebook: PqCodebook = PqCodebook(64, Array.fill(4)(
    Array(Array.fill(16)(0f), Array.fill(16)(0.1f))))

  private def quantizeFixed(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val codes = ProductQuantizer.quantizeUdf(fixedCodebook)(col("embedding"))
    e.withColumn("codes", codes)
      .select(
        col("vec_id"),
        element_at(col("codes"), 1).cast("int").as("c0"),
        element_at(col("codes"), 2).cast("int").as("c1"),
        element_at(col("codes"), 3).cast("int").as("c2"),
        element_at(col("codes"), 4).cast("int").as("c3"))
      .orderBy("vec_id")
  }

  // recallGate's searchPq runs with the exact re-rank (LUT pre-selects
  // ef=100 candidates, true floats ranked for the top-10): LUT-only
  // top-k recall decays with corpus size — it passed at 500 vectors and
  // failed at 2,000 — while rerank recall is set by candidate coverage,
  // which the LUT retains at any scale.

  /** DuckDB argmin over the same two constant centroids per 16-slice. */
  private def quantizeFixedOracle: String = {
    def code(i: Int): String = {
      val lo = 16 * i + 1
      val hi = 16 * (i + 1)
      s"""CASE WHEN list_sum(list_transform(embedding[$lo:$hi], x -> CAST(x AS DOUBLE)^2))
         | <= list_sum(list_transform(embedding[$lo:$hi], x -> (CAST(x AS DOUBLE) - 0.1)^2))
         | THEN 0 ELSE 1 END AS c$i""".stripMargin.replace("\n", "")
    }
    s"""SELECT vec_id, ${code(0)}, ${code(1)}, ${code(2)}, ${code(3)}
       |FROM embeddings ORDER BY vec_id""".stripMargin
  }

  /** Multi-query recall protocol ([[RecallProtocol]], the reference's
    * calculate_table_recall run with 100 queries at hnsw_pq.sql:83-86):
    * codebook trained on the base with the query set HELD OUT, all 50
    * queries answered in ONE batched `searchPqMany` pass (codegen'd
    * keyed ADC + exact rerank), mean recall@10 ≥ 0.8 vs the exact
    * per-query top-10 from one window join. */
  private def recallGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir).cache()
    try {
      val h = RecallProtocol.holdout(e)
      val cb = ProductQuantizer.trainCodebook(
        h.base, "embedding", clusters = 64, subvectors = 32, seed = 7)
      val pq = ProductQuantizer.quantizeTable(h.base, "embedding", cb)
      val exactF = RecallProtocol.async(
        RecallProtocol.truth(h.queriesDf, h.base, "vec_id", "embedding"))
      val approx = RecallProtocol.perQueryDf(ProductQuantizer
        .searchPqMany(pq, "vec_id", "embedding_pq", cb, h.queries.toSeq, 10,
          rerankCol = Some("embedding"), ef = 100))
      if (RecallProtocol.meanRecallOk(approx, exactF())) Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally { e.unpersist(); () }
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("pq_quantize_fixed", Some(quantizeFixedOracle), quantizeFixed),
    QueryDef("pq_recall_gate", Some("SELECT 1 AS ok"), recallGate),
  )
}
