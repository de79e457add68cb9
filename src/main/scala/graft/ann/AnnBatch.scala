package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared pieces of the batched (kNN-join) index search paths. */
private[ann] object AnnBatch {

  /** Exact-rerank arm shared by the compact-code kinds' `searchMany`
    * ([[IvfPqIndex]], [[PqAnnIndex]]): keep each query's top-`pool`
    * candidates of `local` (query_id, neighbor_id, dist-estimate),
    * join them back to the float source ONCE (broadcast candidate and
    * query tables), score by exact l2sq, re-rank to k — single-sourced
    * so the pool/tie-break/metric contract cannot drift between kinds.
    * `unitNormSrc` unit-normalizes the source vectors (cos-built
    * indexes store normalized vectors and queries arrive normalized,
    * so exact l2sq on unit vectors preserves the cosine ordering). */
  def rerankPool(
      local: DataFrame,
      src: DataFrame,
      srcId: String,
      srcVec: String,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      pool: Int,
      unitNormSrc: Boolean): DataFrame = {
    val spark = local.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    val cands = local.withColumn("rank", row_number().over(w))
      .where(col("rank") <= pool)
      .select("query_id", "neighbor_id")
    val qDf = queries.map { case (qid, q) => (qid, q.toSeq) }
      .toDF("query_id", "__q")
    val srcVecCol =
      if (unitNormSrc)
        org.apache.spark.sql.graftshim.GraftSqlShim.column(
          graft.functions.UnitNormalize(
            org.apache.spark.sql.graftshim.GraftSqlShim.expression(col(srcVec))))
      else col(srcVec)
    src.select(col(srcId).cast(LongType).as("neighbor_id"), srcVecCol.as("__v"))
      .join(broadcast(cands), Seq("neighbor_id"))
      .join(broadcast(qDf), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.l2sq_dist(col("__v"), col("__q")).as("dist"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
