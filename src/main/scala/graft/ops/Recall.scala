package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed recall@k measurement — the user-facing analog of the
  * reference's `calculate_table_recall(tbl, query_tbl, truth_tbl, col,
  * k, cnt)` (lantern_hnsw/test/sql/utils/calculate_recall.sql:1-48,
  * driven by every recall regression, e.g. hnsw_pq.sql:83-86): mean
  * over queries of |retrieved ∩ truth| / k.
  *
  * Unlike the in-repo [[graft.queries.RecallProtocol]] (which collects
  * per-query id sets driver-side for gate assertions over ≤100
  * queries), this computes the whole measurement as ONE aggregation
  * plan — semi-join on (query, id), per-query hit count, average — so
  * a 100 TB evaluation with millions of queries never materializes a
  * row on the driver beyond the single scalar.
  */
object Recall {

  /** Per-query recall@k as a DataFrame `(qidCol, recall: double)`.
    *
    * `retrieved` and `truth` both carry `(qidCol, idCol)` rows; extra
    * columns are ignored. Duplicates are collapsed before counting
    * (the reference's ARRAY INTERSECT has set semantics). Queries
    * present in `truth` but absent from `retrieved` score 0.0 — a
    * silently-unanswered query is a recall failure, not a skip.
    * Queries absent from `truth` are not scored (there is nothing to
    * recall against), mirroring the reference's LEFT JOIN onto the
    * truth table.
    */
  def perQueryRecall(retrieved: DataFrame, truth: DataFrame, k: Int,
      qidCol: String = "query_id", idCol: String = "id"): DataFrame = {
    require(k >= 1, s"graft: recall k must be >= 1, got $k")
    val r = retrieved.select(col(qidCol), col(idCol)).dropDuplicates()
    val t = truth.select(col(qidCol), col(idCol)).dropDuplicates()
    val hits = r.join(t, Seq(qidCol, idCol), "leftsemi")
      .groupBy(col(qidCol)).agg(count(lit(1)).as("__hits"))
    t.select(col(qidCol)).distinct()
      .join(hits, Seq(qidCol), "left")
      .select(col(qidCol),
        (coalesce(col("__hits"), lit(0L)) / lit(k.toDouble)).as("recall"))
  }

  /** Mean recall@k over every query in `truth` — the scalar the
    * reference function returns. One aggregation, no driver loop. */
  def tableRecall(retrieved: DataFrame, truth: DataFrame, k: Int,
      qidCol: String = "query_id", idCol: String = "id"): Double =
    perQueryRecall(retrieved, truth, k, qidCol, idCol)
      .agg(avg(col("recall"))).head().getDouble(0)
}
