package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: print logical vs optimized output nullability for the
  * BM25 inverted-table plan (chasing the LogicalRDD WARN). */
object NullDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), graft.functions.tokenize(col("text")).as("terms"))
    val inv = graft.text.Bm25.createBm25Table(docs, "doc_id", "terms",
      bloomThreshold = args.headOption.map(_.toInt).getOrElse(8000))
    println("=== full searchBm25 ===")
    graft.text.Bm25.searchBm25(inv, Seq("scan", "merge", "join"), 10)
      .collect()
    println("=== done ===")
    val pinned = inv.where($"term".isin("w1", "w2")).select(
      inv.schema.fieldNames.toIndexedSeq.map(f =>
        org.apache.spark.sql.graftshim.GraftSqlShim.column(
          org.apache.spark.sql.catalyst.expressions.KnownNullable(
            org.apache.spark.sql.graftshim.GraftSqlShim.expression(col(f))))
          .as(f)): _*)
    val qe = pinned.queryExecution
    val log = qe.analyzed.output
    val opt = qe.optimizedPlan.output
    log.zip(opt).foreach { case (a, b) =>
      val mark = if (a.nullable != b.nullable) "  <-- MISMATCH" else ""
      println(f"${a.name}%-14s analyzed=${a.nullable}%-5s optimized=${b.nullable}$mark")
    }
    spark.stop()
  }
}
