package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.cos_dist

/** Deterministic k-means over an embedding column + SemDeDup (Abbas
  * et al., "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication", 2023): cluster the corpus embeddings, then
  * drop every vector that has a lower-id neighbor in the SAME cluster
  * with cosine similarity above the threshold.
  *
  * Determinism contract (what makes this oracle-replayable, unlike
  * MLlib's randomized k-means‖ — use that for production fitting when
  * replay doesn't matter):
  *  - initial centroids = the `k` lowest-id vectors, cast to double;
  *  - a FIXED number of Lloyd iterations (no convergence test);
  *  - assignment by squared-L2 ROUNDED to 4 decimals (absorbs
  *    cross-engine summation-order ulps with wide margin — round-6
  *    measured one boundary flip in 5k docs), ties → lowest cluster
  *    id;
  *  - new centroids = per-dimension mean rounded to 6 decimals; empty
  *    clusters keep their previous centroid.
  *
  * Scale shape: each Lloyd iteration is one map-side argmin against a
  * broadcast `k×dim` double table plus one `(cluster, dim)`-keyed
  * aggregate — shuffle rows ≤ k·dim. SemDeDup's pair scan self-joins
  * WITHIN clusters only (the paper's point: k scales with corpus size,
  * so cluster populations — and the quadratic term — stay bounded).
  */
object EmbedCluster {

  /** `centroids(c)(d)`: double coords, rounded per the contract. */
  case class Model(centroids: Array[Array[Double]])

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Squared-L2 to one double-literal centroid, in doubles, rounded
    * to 4 decimals — `aggregate(zip_with(...))` over the cast vector,
    * sequential like the SQL replay. */
  private def distCol(vecCol: Column, centroid: Array[Double]): Column =
    round(aggregate(
      zip_with(vecCol, typedlit(centroid.toSeq),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x), 4)

  /** Nearest-centroid id (ties → lowest): one map-side pass. */
  def assign(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val byDist = array(model.centroids.zipWithIndex.map { case (c, i) =>
      struct(distCol(col(vecCol), c).as("d"), lit(i).as("k"))
    }: _*)
    df.select(col(idCol), col(vecCol), array_min(byDist).as("__best"))
      .select(col(idCol), col(vecCol),
        col("__best.k").as("cluster"), col("__best.d").as("dist"))
  }

  def fit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): Model = {
    require(k >= 1 && iters >= 0, s"graft: bad kmeans params k=$k iters=$iters")
    val init = df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(init.length == k, s"graft: corpus smaller than k=$k")
    var cents = init
    var it = 0
    while (it < iters) {
      val assigned = assign(df, idCol, vecCol, Model(cents))
      val means = assigned
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = round6(r.getDouble(2))
      }
      cents = next
      it += 1
    }
    Model(cents)
  }

  /** SemDeDup keep set: ids WITHOUT a lower-id same-cluster neighbor
    * of cosine distance ≤ `maxCosDist`. Pair scan is cluster-local. */
  def semDedupKeepers(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      maxCosDist: Double): DataFrame = {
    val a = assign(df, idCol, vecCol, model)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"), col("cluster"))
    val dropped = a.as("x").join(a.as("y"),
        col("x.cluster") === col("y.cluster") &&
          col("x.__id") < col("y.__id") &&
          cos_dist(col("x.__v"), col("y.__v")) <= maxCosDist)
      .select(col("y.__id").as("__did")).distinct()
    df.join(dropped, col(idCol) === col("__did"), "left_anti")
      .select(col(idCol))
  }
}
