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
}
