package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Version-over-version corpus audit — what changed between two
  * snapshots of a dataset: every id classified added / removed /
  * changed / unchanged. The ingestion-pipeline regression check
  * ("today's crawl replaced 2% of documents — expected?") and the
  * provenance record for dataset cards.
  *
  * Scale shape: each side reduces to (id, 64-bit content hash) BEFORE
  * the full-outer join, so the shuffle carries 16 bytes per row
  * instead of document text. xxhash64 collisions would misreport a
  * changed doc as unchanged at ~n²/2⁶⁴ odds — negligible at any real
  * corpus size, and an audit tolerates it; use a wider digest upstream
  * if bit-certainty is required.
  */
object CorpusDiff {

  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"),
      xxhash64(col(textCol)).as("__oh"))
    val n = newDf.select(col(idCol).as("id"),
      xxhash64(col(textCol)).as("__nh"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__oh").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__oh") =!= col("__nh"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** One-row-per-status rollup of [[diff]]. */
  def diffSummary(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
}
