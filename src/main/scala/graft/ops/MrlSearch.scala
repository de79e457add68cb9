package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Matryoshka (prefix-truncated) two-stage search — the adaptive
  * retrieval pattern for MRL-style embeddings (Kusupati et al.,
  * "Matryoshka Representation Learning", NeurIPS 2022): stage 1 ranks
  * the corpus by distance over only the FIRST `m` dimensions (m/dim of
  * the distance arithmetic; with a materialized prefix column, m/dim
  * of the scan bytes), stage 2 re-ranks the per-query pool by exact
  * full-dimension distance. For embeddings trained with matryoshka
  * losses the prefix carries most of the signal, so small m and small
  * pools preserve recall; for generic embeddings the prefix behaves
  * like an axis-aligned random projection and the pool is the recall
  * knob (the property the gate measures).
  *
  * Everything is built-ins: `slice` for the prefix (stays in
  * whole-stage codegen), the codegen'd distance kernels, and per-query
  * rank windows that Spark 4 plans as partial WindowGroupLimits — each
  * task pre-prunes to pool/k rows before its single shuffle. No
  * training pass, no driver state: the "index" is a column slice,
  * which is what makes this the cheapest scale lever of the
  * dimensionality-reduction family ([[Pca]], [[RandomProjection]]
  * trade a fit pass or a stored matrix for better prefixes).
  */
object MrlSearch {

  /** The materialized-prefix column for the scale path: store
    * `prefix(vec, m)` next to (or instead of re-reading) the full
    * vector so stage 1 scans m/dim of the bytes. */
  def prefix(vec: Column, m: Int): Column = slice(vec, 1, m)

  /** Batched two-stage truncated kNN. Output is searchMany-shaped:
    * (query_id, neighbor_id, dist, rank ≤ k) with `dist` the exact
    * full-dimension `metric` distance, ties broken by neighbor id.
    * Stage 1 ranks by `metric` over the first `m` dims.
    */
  def topKMany(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      pool: Int,
      m: Int,
      metric: String = "l2sq"): DataFrame = {
    require(pool >= k, s"graft: pool ($pool) must be >= k ($k)")
    require(m >= 1, s"graft: prefix dim m ($m) must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val qPre = queries
      .map { case (qid, q) => (qid, q.take(m).toSeq) }
      .toDF("query_id", "__qp")
    val qVecs = queries.map { case (qid, q) => (qid, q.toSeq) }
      .toDF("query_id", "__qv")
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("__pd"), col("neighbor_id"))
    val we = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    df.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol))
      .crossJoin(broadcast(qPre))
      .select(col("neighbor_id"), col(vecCol), col("query_id"),
        VectorSearch.distance(metric, prefix(col(vecCol), m), col("__qp"))
          .as("__pd"))
      .withColumn("__pr", row_number().over(wp))
      .where(col("__pr") <= pool)
      .join(broadcast(qVecs), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorSearch.distance(metric, col(vecCol), col("__qv")).as("dist"))
      .withColumn("rank", row_number().over(we))
      .where(col("rank") <= k)
  }
}
