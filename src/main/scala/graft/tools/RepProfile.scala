package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextAnalysis

/** Dev tool: per-column timing of the repetition_quality signals. */
object RepProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .repartition(32).localCheckpoint()
    timed("count")(docs.count())
    def force(c: org.apache.spark.sql.Column): Unit =
      docs.select(c.as("x")).agg(sum(hash(col("x")))).head()
    timed("tokenize")(force(graft.functions.tokenize(col("text"))))
    timed("shingles2")(force(graft.ops.Dedup.shingles(graft.functions.tokenize(col("text")), 2)))
    timed("top_2gram")(force(TextAnalysis.topNgramFraction(col("text"), 2)))
    timed("dup_3gram")(force(TextAnalysis.dupNgramFraction(col("text"), 3)))
    timed("max_token")(force(TextAnalysis.maxTokenFraction(col("text"))))
    timed("dup_line")(force(TextAnalysis.dupLineFraction(col("text"))))
    spark.stop()
  }
}
