package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the planner-level lateral kNN join: registers an HNSW
  * index over the sf0.001 embeddings table, runs the reference-shaped
  * LATERAL SQL (hnsw_select.sql:66-69), and prints the plan — without
  * the AnnLateralKnnRule rewrite this SQL cannot even analyze
  * (CORRELATED_REFERENCE is unsupported vanilla).
  */
object LateralDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = "/root/testdata/sf0.001"
    val tablePath = s"$dir/embeddings.parquet"
    val e = spark.read.parquet(tablePath)
    val idx = "/tmp/lateral_dbg_idx"
    graft.ann.AnnIndex.build(e, "vec_id", "embedding", idx,
      graft.ann.AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 2))
    graft.plans.AnnCatalog.register(spark, tablePath,
      graft.plans.AnnCatalog.IndexMeta(idx, "vec_id", "embedding", "l2sq", ef = 64))

    e.createOrReplaceTempView("emb")
    val q = spark.sql(
      """SELECT p.vec_id AS query_id, t.vec_id AS neighbor_id
        |FROM (SELECT vec_id, embedding FROM emb WHERE vec_id < 3) p,
        |LATERAL (
        |  SELECT vec_id FROM emb ORDER BY l2sq_dist(embedding, p.embedding) LIMIT 2
        |) t""".stripMargin)
    println("=== optimized ===")
    println(q.queryExecution.optimizedPlan.treeString)
    println("=== physical ===")
    println(q.queryExecution.executedPlan.treeString)
    q.orderBy("query_id", "neighbor_id").show(20, false)
    spark.stop()
  }
}
