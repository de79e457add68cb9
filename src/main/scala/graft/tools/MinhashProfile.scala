package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.tokenize

/** Ad-hoc stage profiler for the minhash dedup pipeline (dev tool). */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokenize(col("text")).as("toks"))

    val base = docs.select(
      col("doc_id").cast("long").as("id"),
      array_distinct(transform(col("toks"), t => xxhash64(t))).as("toks"))
      .withColumn("sig", graft.ops.Dedup.minhashSignature(col("toks"), 128))
      .cache()
    timed("base (sig compute)") { base.count() }

    val banded = base.select($"id",
      posexplode(transform(sequence(lit(0), lit(31)), b =>
        xxhash64(slice($"sig", b * lit(4) + lit(1), lit(4))))).as(Seq("band", "bhash")))
    timed("banded count") { banded.count() }

    val buckets = banded.groupBy($"band", $"bhash")
      .agg(sort_array(collect_list($"id")).as("ids"))
      .where(size($"ids") > 1 && size($"ids") <= 1000)
    timed("buckets count") { buckets.count() }

    val pairsCol = flatten(transform($"ids", (x, i) =>
      transform(slice($"ids", i + lit(2), size($"ids")), y =>
        struct(x.as("_1"), y.as("_2")))))
    val rawPairs = buckets.select(explode(pairsCol).as("p"))
      .select($"p._1".as("id_a"), $"p._2".as("id_b"))
    timed("raw pairs count") { println("  raw pairs = " + rawPairs.count()) }

    val candidates = rawPairs.distinct()
    timed("distinct pairs") { println("  distinct pairs = " + candidates.count()) }

    val toks = base.select($"id", $"toks")
    val verified = candidates
      .join(toks.withColumnRenamed("id", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
      .join(toks.withColumnRenamed("id", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
      .withColumn("jaccard", graft.ops.Dedup.jaccard($"toks_a", $"toks_b"))
      .where($"jaccard" >= 0.8)
    timed("verify joins + jaccard") { println("  out pairs = " + verified.count()) }

    spark.stop()
  }
}
