package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ann.{AnnIndex, AnnParams, IvfIndex}
import graft.functions.inner_product
import graft.plans.{AnnCatalog, AnnScanLogical}

/** Dev tool: break down the knn_inner_ann gate. Not part of the library. */
object InnerDebug {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val exact = e
      .withColumn("d", -inner_product(col("embedding"), lit(q)))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    println(s"[dbg] exact: ${exact.toSeq.sorted}")

    val hPath = java.nio.file.Files.createTempDirectory("innerdbg-h").toString + "/idx"
    AnnIndex.build(e, "vec_id", "embedding", hPath,
      AnnParams(m = 16, efConstruction = 128, ef = 64, metric = "inner", numPartitions = 4))
    val hnsw = AnnIndex.search(spark, hPath, q, 10).map(_._1).toSet
    println(s"[dbg] hnsw : ${hnsw.toSeq.sorted} recall=${hnsw.intersect(exact).size / 10.0}")

    val iPath = java.nio.file.Files.createTempDirectory("innerdbg-i").toString + "/idx"
    IvfIndex.build(e, "vec_id", "embedding", iPath, nlists = 16, metric = "inner")
    Seq(8, 10, 12, 14).foreach { np =>
      val ivf = IvfIndex.search(spark, iPath, q, 10, nprobe = np)
        .select("id").collect().map(_.getLong(0)).toSet
      println(s"[dbg] ivf nprobe=$np recall=${ivf.intersect(exact).size / 10.0}")
    }

    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(hPath, "vec_id", "embedding", "inner", ef = 64))
    val knn = e.select(col("vec_id"), col("embedding"))
      .orderBy(-inner_product(col("embedding"), lit(q))).limit(10)
    val usedIndex = knn.queryExecution.optimizedPlan.collect {
      case a: AnnScanLogical => a
    }.nonEmpty
    val got = knn.select("vec_id").collect().map(_.getLong(0)).toSet
    println(s"[dbg] planner: usedIndex=$usedIndex ids=${got.toSeq.sorted} " +
      s"recall=${got.intersect(exact).size / 10.0}")
    spark.stop()
  }
}
