package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run a comma-separated subset of SparkEntry queries and
  * dump each result as one parquet dir under outDir (the Verify shape,
  * restricted) — for iterating on a new gate without paying the full
  * 180+-query Verify pass. */
object RunQueries {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    for (name <- names.split(",")) {
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(name)(spark, sfDir)
          .localCheckpoint().coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        println(f"[runq] $name ok ${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch { case e: Throwable =>
        println(s"[runq] $name FAILED: ${e.getMessage}")
        e.printStackTrace()
      }
    }
    spark.stop()
  }
}
