package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time the sub-steps of SubstringDedup at a given sf.
  * Usage: runMain graft.tools.SubstrProfile <sfDir>
  */
object SubstrProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir).cache()
    docs.count()
    val minLen = 40

    def time(label: String)(f: => Unit): Unit =
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[ssprof] $label#$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }

    val d = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text").as("__text"))
    val positions = d
      .withColumn("pos", explode(when(
        length(col("__text")) >= minLen,
        sequence(lit(1), length(col("__text")) - (minLen - 1)))
        .otherwise(array().cast("array<int>"))))
    val gram = col("__text").substr(col("pos"), lit(minLen))

    time("positions.count")(positions.count())
    time("hash.agg")(positions.select(xxhash64(gram).as("h"))
      .groupBy("h").agg(count(lit(1)).as("n")).where(col("n") > 1)
      .queryExecution.toRdd.foreach(_ => ()))
    val dupHashes = positions.select(xxhash64(gram).as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"))
      .where(col("n") > 1).select("h")
    time("cand.count")(positions.withColumn("h", xxhash64(gram))
      .join(dupHashes, "h").count())
    time("dupwin")(graft.ops.SubstringDedup
      .duplicatedWindows(docs, "doc_id", "text", minLen)
      .queryExecution.toRdd.foreach(_ => ()))
    time("spans")(graft.ops.SubstringDedup
      .duplicatedSpans(docs, "doc_id", "text", minLen)
      .queryExecution.toRdd.foreach(_ => ()))
    time("clean")(graft.ops.SubstringDedup
      .removeDuplicated(docs, "doc_id", "text", minLen)
      .queryExecution.toRdd.foreach(_ => ()))
    spark.stop()
  }
}
