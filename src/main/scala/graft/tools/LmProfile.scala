package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time the sub-steps of NgramLm to find where
  * perplexity_filter / topk_ngrams spend their ~8-10s at sf0.1.
  * Usage: runMain graft.tools.LmProfile <sfDir>
  */
object LmProfile {
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

    def time(label: String)(f: => Unit): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[lmprof] $label#$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }

    // raw explode of trigram positions
    val pos3 = docs
      .select(col("doc_id"), col("text").as("__text"))
      .withColumn("pos", explode(when(
        length(col("__text")) >= 3,
        sequence(lit(1), length(col("__text")) - 2))
        .otherwise(array().cast("array<int>"))))
      .select(col("doc_id"), col("__text").substr(col("pos"), lit(3)).as("gram"))
    time("positions3.count")(pos3.count())
    time("counts3.agg")(pos3.groupBy("gram").agg(count(lit(1))).queryExecution.toRdd.foreach(_ => ()))

    // split-based token grams (topNgrams path)
    val toks = filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "")
    val grams = docs.select(explode(transform(
      when(size(toks) >= 2, sequence(lit(1), size(toks) - 1))
        .otherwise(array().cast("array<int>")),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))).as("gram"))
    time("wordgrams.count")(grams.count())
    time("wordgrams.topk")(grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram")).limit(20)
      .queryExecution.toRdd.foreach(_ => ()))

    time("full.topNgrams")(graft.text.NgramLm.topNgrams(docs, "text", 2, 20)
      .queryExecution.toRdd.foreach(_ => ()))
    time("full.perplexity")(graft.text.NgramLm.perplexityBits(docs, "doc_id", "text")
      .queryExecution.toRdd.foreach(_ => ()))
    spark.stop()
  }
}
