package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics — the evaluation half of a search engine:
  * given ranked `results` and graded relevance `judgments`, compute
  * per-query recall@k, MRR@k and nDCG@k (Järvelin & Kekäläinen, TOIS
  * 2002; exponential gains 2^rel − 1).
  *
  * The per-rank DCG discounts `1/log2(r+1)` are computed ONCE on the
  * driver and embedded as literal doubles — evaluation stays pure
  * arithmetic (no engine-specific log in the hot path), and an oracle
  * interpolating the SAME literals replays bit-for-bit.
  *
  * Scale shape: one (query_id, doc_id) join of rank-bounded results
  * against judgments, two judgment aggregates (one windowed for the
  * ideal ordering) — everything partitions by query_id; per-task state
  * is one query's top-k.
  */
object RankMetrics {

  /** `1/log2(r+1)` for r = 1..k. */
  def discounts(k: Int): Array[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0))).toArray

  /** Per-query metrics. `results`: (query_id, doc_id, rank 1-based);
    * `judgments`: (query_id, doc_id, rel ≥ 0) — rel 0 rows are
    * ignored. Queries present in `results` but with no relevant docs
    * report 0 metrics (n_rel = 0). */
  def evaluate(results: DataFrame, judgments: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"graft: rank metrics need k >= 1, got $k")
    val disc = typedLit(discounts(k).toSeq)
    val r = results.where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val j = judgments.where(col("rel") > 0)
      .select(col("query_id"), col("doc_id"), col("rel"))
    val gained = r.join(j, Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
      .groupBy("query_id")
      .agg(
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_hits"),
        max(when(col("rel") > 0, lit(1.0) / col("rank"))).as("__rr"),
        sum((pow(lit(2.0), col("rel")) - 1.0) *
          element_at(disc, col("rank").cast("int"))).as("__dcg"))
    val iw = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("doc_id"))
    val ideal = j
      .withColumn("__ir", row_number().over(iw))
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("__ir") <= k,
          (pow(lit(2.0), col("rel")) - 1.0) *
            element_at(disc, col("__ir").cast("int")))).as("__idcg"))
    gained.join(ideal, Seq("query_id"), "left")
      .select(
        col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("n_hits"),
        when(coalesce(col("n_rel"), lit(0L)) === 0, 0.0)
          .otherwise(col("n_hits").cast("double") / col("n_rel"))
          .as("recall"),
        coalesce(col("__rr"), lit(0.0)).as("mrr"),
        when(coalesce(col("__idcg"), lit(0.0)) === 0.0, 0.0)
          .otherwise(col("__dcg") / col("__idcg")).as("ndcg"))
  }
}
