package graft.tools
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ann.IvfPqIndex
import graft.functions.l2sq_dist

object IvfPqDbg {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val path = java.nio.file.Files.createTempDirectory("dbg-ivfpq").toString + "/idx"
    val clusters = if (args.nonEmpty) args(0).toInt else 64
    IvfPqIndex.build(e, "vec_id", "embedding", path, nlists = 8, subvectors = 8, clusters = clusters)
    val q = e.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    // LUT-only full ranking
    val lut = IvfPqIndex.search(spark, path, q, k = 1000, nprobe = 8)
      .collect().map(_.getLong(0)).zipWithIndex.toMap
    val exact = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0))
    println("total rows: " + e.count())
    exact.foreach(id => println(s"true-neighbor id=$id lutRank=${lut.getOrElse(id, -1)}"))
    spark.stop()
  }
}
