package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Matryoshka (prefix-truncated) two-stage search — the adaptive
  * retrieval pattern for MRL-style embeddings (Kusupati et al.,
  * "Matryoshka Representation Learning", NeurIPS 2022): stage 1 ranks
  * the corpus by distance over only the FIRST `m` dimensions (m/dim of
  * the distance arithmetic; on the [[topKManyPrepacked]] path with a
  * materialized prefix column, m/dim of the scan bytes too), stage 2
  * re-ranks the per-query pool by exact full-dimension distance. For
  * embeddings trained with matryoshka losses the prefix carries most
  * of the signal, so small m and small pools preserve recall; for
  * generic embeddings the prefix behaves like an axis-aligned random
  * projection and the pool is the recall knob (the property the gate
  * measures).
  *
  * Scale shape (shared with [[BqSearch]] — the same two-stage
  * skeleton, prefix-l2 standing in for hamming): stage 1 is a
  * broadcast cross-join of the tiny truncated query set against the
  * corpus with a per-query rank window that Spark 4 plans as a partial
  * WindowGroupLimit — each task pre-prunes to `pool` rows before its
  * single shuffle, and ONLY (query_id, neighbor_id) pairs ride that
  * shuffle (never the vectors). Stage 2 broadcasts the pool-id set
  * back to the vector table ([[BqSearch.rescore]]), so the
  * full-dimension column is read for queries × pool rows, not the
  * corpus. No training pass, no driver state: the "index" is a column
  * slice, which is what makes this the cheapest scale lever of the
  * dimensionality-reduction family ([[Pca]], [[RandomProjection]]
  * trade a fit pass or a stored matrix for better prefixes).
  */
object MrlSearch {

  /** The materialized-prefix column for the scale path: store
    * `prefix(vec, m)` next to the full vector (or in its own narrow
    * table) so stage 1 scans m/dim of the bytes —
    * [[topKManyPrepacked]] serves from it. */
  def prefix(vec: Column, m: Int): Column = slice(vec, 1, m)

  /** Batched two-stage truncated kNN, prefix computed inline (one scan
    * slices on the fly). Output is searchMany-shaped: (query_id,
    * neighbor_id, dist, rank ≤ k) with `dist` the exact full-dimension
    * `metric` distance, ties broken by neighbor id. Stage 1 ranks by
    * `metric` over the first `m` dims; its shuffle carries only id
    * pairs, the rescore joins back to `df` for the full vectors. */
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
    val pre = df.select(col(idCol).cast("long").as("neighbor_id"),
      prefix(col(vecCol), m).as("__pref"))
    BqSearch.rescore(
      prerank(pre, "neighbor_id", "__pref", queries, pool, m, metric),
      df, idCol, vecCol, queries, k, metric)
  }

  /** Scale path: stage 1 scans ONLY the (id, prefix) table — m/dim of
    * the vector bytes; the pool ids then join back to the full-vector
    * table for the exact rescore. `prefixes.prefixCol` must hold
    * [[prefix]]`(vec, m)` of the SAME vectors `vecs.vecCol` carries.
    * Results are bit-identical to [[topKMany]] at the same (m, pool):
    * both stages use the same distance kernels and tiebreaks. */
  def topKManyPrepacked(
      prefixes: DataFrame,
      idCol: String,
      prefixCol: String,
      vecs: DataFrame,
      vecCol: String,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      pool: Int,
      m: Int,
      metric: String = "l2sq"): DataFrame = {
    require(pool >= k, s"graft: pool ($pool) must be >= k ($k)")
    require(m >= 1, s"graft: prefix dim m ($m) must be >= 1")
    val pre = prefixes.select(
      col(idCol).cast("long").as("neighbor_id"), col(prefixCol).as("__pref"))
    BqSearch.rescore(
      prerank(pre, "neighbor_id", "__pref", queries, pool, m, metric),
      vecs, idCol, vecCol, queries, k, metric)
  }

  /** Stage 1: per-query prefix-distance pre-rank to `pool` candidates.
    * Returns (query_id, neighbor_id) — the window input carries the id
    * and the distance only, never a vector column, so the stage's
    * shuffle is two longs + a double per surviving row. */
  private def prerank(
      pre: DataFrame,
      idCol: String,
      prefCol: String,
      queries: Seq[(Long, Array[Float])],
      pool: Int,
      m: Int,
      metric: String): DataFrame = {
    val spark = pre.sparkSession
    import spark.implicits._
    val qPre = queries
      .map { case (qid, q) => (qid, q.take(m).toSeq) }
      .toDF("query_id", "__qp")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__pd"), col(idCol))
    pre
      .crossJoin(broadcast(qPre))
      .select(col("query_id"), col(idCol),
        VectorSearch.distance(metric, col(prefCol), col("__qp")).as("__pd"))
      .withColumn("__pr", row_number().over(w))
      .where(col("__pr") <= pool)
      .select(col("query_id"), col(idCol))
  }
}
