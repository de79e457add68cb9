package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval fusion — reciprocal-rank fusion
  * (Cormack, Clarke & Büttcher, SIGIR 2009):
  * `rrf(d) = Σ_lists 1 / (k0 + rank_list(d))`. Rank-based, so BM25
  * scores and vector distances fuse without calibrating onto a shared
  * scale — the standard production hybrid-search combiner over exactly
  * the two retrieval paths this engine serves (`text.Bm25` and the ANN
  * index).
  *
  * Scale shape: the inputs are TOP-K RESULT LISTS (k-bounded by
  * construction), so the rank window and the fused aggregate run over
  * k·lists rows — bounded by parameters, not the corpus; the heavy
  * lifting stays inside the upstream searches.
  */
object HybridSearch {

  /** Attach 1-based ranks to a top-N result list under a total order. */
  def ranked(df: DataFrame, idCol: String, orderBy: Seq[Column]): DataFrame =
    df.select(col(idCol).as("id"),
      row_number().over(Window.orderBy(orderBy: _*)).as("rank"))

  /** Fuse ranked lists into the top-`n` by RRF score (ties by id).
    * Each list contributes `1/(k0 + rank)` for the ids it contains;
    * absent ids contribute nothing (the usual convention). */
  def rrf(lists: Seq[DataFrame], n: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "graft: rrf needs at least one ranked list")
    require(k0 >= 0, s"graft: rrf k0 must be >= 0, got $k0")
    lists
      .map(_.select(col("id"),
        (lit(1.0) / (lit(k0.toDouble) + col("rank"))).as("__c")))
      .reduce(_ unionByName _)
      .groupBy("id")
      .agg(sum(col("__c")).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(n)
  }
}
