package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All driver-checkable queries, one per implemented operator
    * (SURVEY.md §2). Each milestone contributes a block. */
  def allQueries: Seq[QueryDef] =
    VectorQueries.all ++ TextQueries.all ++ PipelineQueries.all ++
      AnnQueries.all ++ PqQueries.all ++ WeightedQueries.all ++
      EmbedQueries.all ++ SourceQueries.all ++ ScalarQuantQueries.all ++
      MultimodalQueries.all ++ HttpQueries.all ++ ExportQueries.all ++
      SelectionQueries.all ++ TextPrepQueries.all ++ ClusterQueries.all ++
      TfIdfQueries.all ++ EventQueries.all ++ SparseQueries.all ++
      MultiVecQueries.all ++ LifecycleQueries.all ++ AdminQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own hello-world: ORDER BY v <-> q LIMIT k. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.head.fn(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
