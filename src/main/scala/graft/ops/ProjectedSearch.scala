package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShim

/** Two-stage exact kNN through a linear projection — the
  * dimensionality-reduction search pattern [[RandomProjection]] and
  * [[Pca]] exist to enable: stage 1 ranks EVERY row by squared
  * distance in the projected space (dimOut/dimIn of the distance
  * arithmetic; with a materialized projected column, dimOut/dimIn of
  * the scan bytes too) and keeps a `pool`; stage 2 re-ranks just the
  * pool by exact full-dimension distance. Both stages are
  * TakeOrderedAndProject — per-partition heaps, no global sort, no
  * shuffle beyond the top-pool collect — and the projected distance is
  * one codegen'd kernel: `q_p` folds into the affine kernel's bias, so
  * `SqNormD(MatVecProject(v, M, b + q_p))` never leaves whole-stage
  * codegen. Exactness: results are the true nearest among the pool;
  * recall is the JL/PCA distance-preservation question the gate
  * measures (pool ≥ corpus ⇒ exact, the property the spec pins).
  */
object ProjectedSearch {

  /** Projected squared distance of `vec` to the query whose PROJECTED
    * image is `qp` (`qp = M·q − bias`, computed by the caller or
    * [[projectQuery]]). */
  def projectedDist(
      vec: Column,
      matrix: Array[Array[Double]],
      bias: Array[Double],
      qp: Array[Double]): Column = {
    val shifted = Array.tabulate(matrix.length) { r =>
      (if (bias != null) bias(r) else 0.0) + qp(r)
    }
    GraftSqlShim.column(graft.functions.SqNormD(
      graft.functions.MatVecProject(
        GraftSqlShim.expression(vec), matrix, shifted)))
  }

  /** `M·q − bias` on the driver (q is one vector). */
  def projectQuery(
      matrix: Array[Array[Double]],
      bias: Array[Double],
      q: Array[Float]): Array[Double] =
    Array.tabulate(matrix.length) { r =>
      val row = matrix(r)
      var s = 0.0
      var j = 0
      while (j < row.length) { s += row(j) * q(j); j += 1 }
      s - (if (bias != null) bias(r) else 0.0)
    }

  /** Exact top-k of `query` over `df` via the projected pre-rank:
    * returns (idCol, dist) with `dist` the exact full-dimension l2sq,
    * ties broken by id. */
  def topK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      matrix: Array[Array[Double]],
      bias: Array[Double],
      query: Array[Float],
      k: Int,
      pool: Int): DataFrame = {
    require(pool >= k, s"graft: pool ($pool) must be >= k ($k)")
    val qp = projectQuery(matrix, bias, query)
    df.select(col(idCol), col(vecCol),
        projectedDist(col(vecCol), matrix, bias, qp).as("__pd"))
      .orderBy(col("__pd"), col(idCol))
      .limit(pool)
      .select(col(idCol),
        graft.functions.l2sq_dist(col(vecCol), lit(query)).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** Batched two-stage projected kNN — output-compatible with
    * [[graft.ann.AnnIndex.searchMany]] (query_id, neighbor_id, dist,
    * rank ≤ k). The table is projected ONCE (codegen'd `M·v − bias`
    * kernel, f32 images: stage 1 is a pre-rank, so f32 precision is
    * part of its approximation budget), the tiny projected-query set
    * cross-joins in (broadcast), and both per-query ranks are rank
    * windows — Spark 4 plans them as partial WindowGroupLimits, so
    * each task pre-prunes to pool/k rows before its single shuffle.
    * Stage 2 re-ranks each query's pool by exact full-dimension l2sq
    * against the true vector column. */
  def topKMany(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      matrix: Array[Array[Double]],
      bias: Array[Double],
      queries: Seq[(Long, Array[Float])],
      k: Int,
      pool: Int): DataFrame = {
    require(pool >= k, s"graft: pool ($pool) must be >= k ($k)")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val spark = df.sparkSession
    import spark.implicits._
    val qProj = queries.map { case (qid, q) =>
      (qid, projectQuery(matrix, bias, q).map(_.toFloat).toSeq)
    }.toDF("query_id", "__qp")
    val projected = df.select(
      col(idCol).cast("long").as("neighbor_id"), col(vecCol),
      GraftSqlShim.column(graft.functions.MatVecProject(
        GraftSqlShim.expression(col(vecCol)), matrix, bias))
        .cast(ArrayType(FloatType)).as("__proj"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("__pd"), col("neighbor_id"))
    val poolRows = projected
      .crossJoin(broadcast(qProj))
      .select(col("query_id"), col("neighbor_id"), col(vecCol),
        graft.functions.l2sq_dist(col("__proj"), col("__qp")).as("__pd"))
      .withColumn("__pr", row_number().over(wp))
      .where(col("__pr") <= pool)
    val qVecs = queries.map { case (qid, q) => (qid, q.toSeq) }
      .toDF("query_id", "__qv")
    val we = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    poolRows
      .join(broadcast(qVecs), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.l2sq_dist(col(vecCol), col("__qv")).as("dist"))
      .withColumn("rank", row_number().over(we))
      .where(col("rank") <= k)
  }
}
