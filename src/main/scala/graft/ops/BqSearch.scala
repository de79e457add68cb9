package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pq.ScalarQuantizer

/** Binary-quantization rescore search — the two-stage retrieval
  * pattern the reference's 1-bit scalar kind exists to serve
  * (`quant_bits = 1`, lantern_hnsw/src/hnsw/options.c:137-158; packed
  * sign-bit distance semantics hnsw.c:308-319): stage 1 ranks the
  * corpus by HAMMING distance between sign-bit signatures — dim/32
  * ints per row, a 32× reduction in scan bytes and distance work when
  * the bits column is materialized — and keeps a `pool` per query;
  * stage 2 re-ranks only the pool by exact full-precision distance.
  *
  * Scale shape: stage 1 is a broadcast cross-join of the (tiny) packed
  * query set against the bits column with a per-query rank window —
  * Spark 4 plans the window as a partial WindowGroupLimit, so every
  * task pre-prunes to `pool` rows before the single shuffle, and the
  * codegen'd `hamming_dist` (two `Integer.bitCount` words at dim 64)
  * keeps the scan in whole-stage codegen. Stage 2 touches only
  * queries × pool rows. On the [[topKManyPrepacked]] path the float
  * vectors are read for THOSE rows alone (the pool-id set broadcasts
  * to the vector table), which is what makes BQ pay at 100 TB: the
  * full-precision column never leaves parquet except for rescoring.
  *
  * Sign thresholds: raw `sign(x)` is informative only for a centered
  * corpus. [[fitCenter]] computes per-dimension means in one
  * partial-aggregated pass; [[pack]] subtracts them before the sign so
  * the signatures split each dimension at its corpus mean (the
  * standard binary-quantization centering trick).
  */
object BqSearch {

  /** Per-dimension corpus means — ONE map-side partial-aggregated
    * shuffle of `dim` keys (posexplode → avg). Deterministic to float
    * tolerance only; callers that need bit-exact replay should persist
    * the center with the bits artifact (it is part of the codec). */
  def fitCenter(df: DataFrame, vecCol: String): Array[Float] =
    df.select(posexplode(col(vecCol)).as(Seq("__p", "__x")))
      .groupBy(col("__p")).agg(avg(col("__x")).as("__m"))
      .collect()
      .sortBy(_.getInt(0))
      .map(_.getDouble(1).toFloat)

  /** Sign-bit signature column (array<int>, 32 dims per word,
    * MSB-first — the layout `hamming_dist` scores). `center = null`
    * packs raw signs. */
  def pack(vec: Column, center: Array[Float] = null): Column =
    if (center == null) ScalarQuantizer.quantize_b1(vec)
    else ScalarQuantizer.quantize_b1(
      zip_with(vec, lit(center), (a, b) => a - b))

  /** Driver-side packing of one query vector with the same semantics
    * as [[pack]]. */
  def packQuery(q: Array[Float], center: Array[Float] = null): Array[Int] =
    if (center == null) ScalarQuantizer.quantizeB1(q)
    else ScalarQuantizer.quantizeB1(
      Array.tabulate(q.length)(i => q(i) - center(i)))

  /** Batched two-stage BQ kNN over a float-vector table, packing
    * inline (one scan computes the signatures on the fly). Output is
    * searchMany-shaped: (query_id, neighbor_id, dist, rank ≤ k),
    * `dist` the exact `metric` distance, ties broken by neighbor id.
    */
  def topKMany(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      pool: Int,
      metric: String = "l2sq",
      center: Array[Float] = null): DataFrame = {
    require(pool >= k, s"graft: pool ($pool) must be >= k ($k)")
    val bits = df.select(
      col(idCol).cast("long").as("neighbor_id"),
      pack(col(vecCol), center).as("__bits"))
    rescore(
      prerank(bits, "neighbor_id", "__bits", queries, pool, center),
      df, idCol, vecCol, queries, k, metric)
  }

  /** Scale path: stage 1 scans ONLY the (id, bits) table; the pool ids
    * then join back to the float-vector table for the rescore, so the
    * full-precision column is read for queries × pool rows, not the
    * corpus. `bits` must have been produced by [[pack]] with the SAME
    * `center`. */
  def topKManyPrepacked(
      bits: DataFrame,
      idCol: String,
      bitsCol: String,
      vecs: DataFrame,
      vecCol: String,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      pool: Int,
      metric: String = "l2sq",
      center: Array[Float] = null): DataFrame = {
    require(pool >= k, s"graft: pool ($pool) must be >= k ($k)")
    val b = bits.select(
      col(idCol).cast("long").as("neighbor_id"), col(bitsCol).as("__bits"))
    rescore(
      prerank(b, "neighbor_id", "__bits", queries, pool, center),
      vecs, idCol, vecCol, queries, k, metric)
  }

  /** Stage 1: per-query hamming pre-rank to `pool` candidates.
    * Returns (query_id, neighbor_id). */
  private def prerank(
      bits: DataFrame,
      idCol: String,
      bitsCol: String,
      queries: Seq[(Long, Array[Float])],
      pool: Int,
      center: Array[Float]): DataFrame = {
    require(pool >= 1, s"graft: pool ($pool) must be >= 1")
    val spark = bits.sparkSession
    import spark.implicits._
    val qBits = queries
      .map { case (qid, q) => (qid, packQuery(q, center).toSeq) }
      .toDF("query_id", "__qb")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__hd"), col(idCol))
    bits
      .crossJoin(broadcast(qBits))
      .select(col("query_id"), col(idCol),
        graft.functions.hamming_dist(col(bitsCol), col("__qb")).as("__hd"))
      .withColumn("__hr", row_number().over(w))
      .where(col("__hr") <= pool)
      .select(col("query_id"), col(idCol))
  }

  /** Stage 2: exact rescore of the pool — the (queries × pool)-row
    * pool set is the BROADCAST side against the big vector table, then
    * one per-query rank window cuts to k. Broadcast sizing: the pool
    * set is queries × pool longs (50 × 384 ≈ 150 KB at gate scale);
    * callers batching MANY queries bound it by chunking the query set
    * — the lateral planner path inherits exactly that from the
    * kNN-join exec's byte-budget chunking, so the broadcast never
    * scales with the corpus, only with the bounded probe chunk.
    * Shared with [[MrlSearch]] — every two-stage searcher here rescores
    * through the same pool-id join-back. */
  private[ops] def rescore(
      poolIds: DataFrame,
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      metric: String): DataFrame = {
    require(k >= 1, s"graft: k ($k) must be >= 1")
    val spark = vecs.sparkSession
    import spark.implicits._
    val qVecs = queries.map { case (qid, q) => (qid, q.toSeq) }
      .toDF("query_id", "__qv")
    val v = vecs.select(
      col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("__nv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    v.join(broadcast(poolIds), Seq("neighbor_id"))
      .join(broadcast(qVecs), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorSearch.distance(metric, col("__nv"), col("__qv")).as("dist"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
