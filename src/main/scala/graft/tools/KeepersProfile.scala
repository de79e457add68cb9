package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._
import graft.ops.Dedup

/** Dev tool: stage-by-stage timing of the minhash keepers pipeline at a
  * given sf dir, to see where wall time goes. Not part of the library.
  */
object KeepersProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  $r")
      r
    }

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokenize(col("text")).as("toks"))
    timed("docs.count")(docs.count())

    val base = docs.select(
      col("doc_id").cast("long").as("id"),
      sort_array(array_distinct(transform(col("toks"), t => xxhash64(t)))).as("th"))
      .withColumn("sig", Dedup.minhashSignature(col("th"), 128))
    val toks = base.select($"id", $"th".as("toks")).localCheckpoint()
    timed("toks.localCheckpoint")(toks.count())

    val banded = base.select(
      $"id",
      posexplode(transform(sequence(lit(0), lit(31)), b =>
        xxhash64(slice($"sig", b * lit(4) + lit(1), lit(4))))).as(Seq("band", "bhash")))
    val buckets = banded
      .groupBy($"band", $"bhash")
      .agg(sort_array(collect_list($"id")).as("ids"))
      .where(size($"ids") > 1)
      .select($"ids")
      .distinct()
      .localCheckpoint()
    timed("buckets.localCheckpoint")(buckets.count())
    timed("bucket size histo")(
      buckets.select(size($"ids").as("n"))
        .select(
          count(lit(1)), sum($"n"), max($"n"),
          sum(($"n" * ($"n" - 1) / 2)).as("pairs_if_exploded"),
          sum(when($"n" > 1000, $"n")).as("big_members"),
          count(when($"n" > 1000, 1)).as("big_buckets"))
        .head())

    val smallPairs = buckets.where(size($"ids") <= 1000)
      .select($"ids", posexplode($"ids").as(Seq("i", "id_a")))
      .where($"i" < size($"ids") - 1)
      .select($"id_a", explode(slice($"ids", $"i" + lit(2), size($"ids"))).as("id_b"))
    timed("smallPairs raw")(smallPairs.count())
    val smallDistinct = smallPairs.distinct().localCheckpoint()
    timed("smallPairs distinct")(smallDistinct.count())

    val verified = smallDistinct
      .join(toks.withColumnRenamed("id", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
      .join(toks.withColumnRenamed("id", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
      .withColumn("jaccard", Dedup.sortedJaccard($"toks_a", $"toks_b"))
      .where($"jaccard" >= 0.8)
      .select($"id_a", $"id_b")
      .localCheckpoint()
    timed("smallEdges verify")(verified.count())

    val big = buckets.where(size($"ids") > 1000)
      .withColumn("bucket_id", monotonically_increasing_id())
      .localCheckpoint()
    timed("big buckets")(big.count())
    val star = big.select(
      $"bucket_id",
      element_at($"ids", 1).as("id_a"),
      explode(slice($"ids", lit(2), size($"ids") - 1)).as("id_b"))
    val starVerified = star
      .join(toks.withColumnRenamed("id", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
      .join(toks.withColumnRenamed("id", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
      .withColumn("jaccard", Dedup.sortedJaccard($"toks_a", $"toks_b"))
      .select($"bucket_id", $"id_a", $"id_b", $"jaccard")
      .localCheckpoint()
    timed("starVerified")(starVerified.count())
    timed("starFailed")(starVerified.where($"jaccard" < 0.8).count())

    val residuePairs = starVerified.where($"jaccard" < 0.8)
      .select($"bucket_id", $"id_b".as("fid"))
      .join(big, "bucket_id")
      .select($"fid", explode($"ids").as("other"))
      .where($"fid" =!= $"other")
      .select(least($"fid", $"other").as("id_a"), greatest($"fid", $"other").as("id_b"))
      .distinct()
      .localCheckpoint()
    timed("residuePairs")(residuePairs.count())
    val residueEdges = residuePairs
      .join(toks.withColumnRenamed("id", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
      .join(toks.withColumnRenamed("id", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
      .withColumn("jaccard", Dedup.sortedJaccard($"toks_a", $"toks_b"))
      .where($"jaccard" >= 0.8)
      .select($"id_a", $"id_b")
    val edges = verified
      .unionByName(starVerified.where($"jaccard" >= 0.8).select($"id_a", $"id_b"))
      .unionByName(residueEdges)
      .distinct()
      .localCheckpoint()
    timed("edges total")(edges.count())

    val comp = timed("connectedComponents") {
      Dedup.connectedComponents(edges, "id_a", "id_b").localCheckpoint()
    }
    timed("comp.count")(comp.count())
    spark.stop()
  }
}
