package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{cos_dist, hamming_dist, inner_product, l2sq_dist}

/** Exact vector search operators.
  *
  * Exact k-NN is the reference's no-index path (`ORDER BY v <-> q LIMIT k`
  * over a seq scan, lantern_hnsw/README.md:101-105) and the correctness
  * oracle for every approximate operator. In Spark the declarative form
  * `orderBy(dist).limit(k)` compiles to `TakeOrderedAndProject`: each
  * partition keeps a local top-k heap and only k rows per partition are
  * merged at the driver — no global sort, no shuffle of the full table.
  * That plan holds at 100 TB: one scan pass, O(k·partitions) merge.
  */
object VectorSearch {

  /** Distance column for a named metric (l2sq | cos | hamming | inner). */
  def distance(metric: String, v: Column, q: Column): Column = metric match {
    case "l2sq" => l2sq_dist(v, q)
    case "cos" => cos_dist(v, q)
    case "hamming" => hamming_dist(v, q).cast("double")
    // max inner product == min negative inner product
    case "inner" => -inner_product(v, q)
    case other => throw new IllegalArgumentException(
      s"graft: unknown metric '$other' (expected l2sq|cos|hamming|inner)")
  }

  /** Exact top-k: append `dist` = metric(vecCol, query) and return the k
    * nearest rows, ties broken by `tieBreak` for determinism.
    */
  def exact(
      df: DataFrame,
      vecCol: Column,
      query: Array[Float],
      k: Int,
      metric: String = "l2sq",
      tieBreak: Seq[Column] = Nil,
      distCol: String = "dist"): DataFrame = {
    val q = lit(query)
    val withDist = df.withColumn(distCol, distance(metric, vecCol, q))
    withDist.orderBy(col(distCol) +: tieBreak: _*).limit(k)
  }

  /** Exact k-NN JOIN: for EVERY row of `queries`, the k nearest rows of
    * `data` — the reference's LATERAL pattern (`test/sql/
    * hnsw_select.sql:66-69`: per-outer-row ORDER BY dist LIMIT k).
    *
    * Shape: broadcast the (small) query side, stream `data` once
    * computing all pairwise distances, then per-query top-k via a
    * rank window partitioned by query id. The shuffle carries
    * |queries|·|data| distance rows — use it when |queries| is
    * modest (the LATERAL use case); for large query sets build an ANN
    * index and use `AnnIndex.searchMany`.
    */
  def knnJoinExact(
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      data: DataFrame,
      dataIdCol: String,
      dataVecCol: String,
      k: Int,
      metric: String = "l2sq"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(queryVecCol).as("__qv")))
    val d = data.select(col(dataIdCol).as("neighbor_id"), col(dataVecCol).as("__dv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    d.crossJoin(q)
      .withColumn("dist", distance(metric, col("__dv"), col("__qv")))
      .withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dist"), col("__rank").as("rank"))
  }

  /** Exact top-k where the query vector comes from a (tiny) one-row
    * DataFrame instead of a literal — broadcast-joined so the big side
    * streams once. Used by the driver-checkable queries so the oracle
    * SQL can express the identical computation.
    */
  def exactVsRow(
      df: DataFrame,
      vecColName: String,
      queryRow: DataFrame,
      queryVecCol: String,
      k: Int,
      metric: String = "l2sq",
      tieBreak: Seq[Column] = Nil,
      distCol: String = "dist"): DataFrame = {
    val q = broadcast(queryRow.select(col(queryVecCol).as("__graft_q")))
    df.crossJoin(q)
      .withColumn(distCol, distance(metric, col(vecColName), col("__graft_q")))
      .drop("__graft_q")
      .orderBy(col(distCol) +: tieBreak: _*)
      .limit(k)
  }
}
