package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._
import graft.ops.Dedup

/** Dev tool: per-round timing of the contraction connected-components
  * loop on the real sf0.1 minhash edge set. Not part of the library.
  */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
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
    val base = docs.select(
      col("doc_id").cast("long").as("id"),
      sort_array(array_distinct(transform(col("toks"), t => xxhash64(t)))).as("th"))
      .withColumn("sig", Dedup.minhashSignature(col("th"), 128))
    val toks = base.select($"id", $"th".as("toks")).localCheckpoint()
    val banded = base.select(
      $"id",
      posexplode(transform(sequence(lit(0), lit(31)), b =>
        xxhash64(slice($"sig", b * lit(4) + lit(1), lit(4))))).as(Seq("band", "bhash")))
    val buckets = banded
      .groupBy($"band", $"bhash")
      .agg(sort_array(collect_list($"id")).as("ids"))
      .where(size($"ids") > 1)
      .select($"ids").distinct().localCheckpoint()
    val smallPairs = buckets.where(size($"ids") <= 1000)
      .select($"ids", posexplode($"ids").as(Seq("i", "id_a")))
      .where($"i" < size($"ids") - 1)
      .select($"id_a", explode(slice($"ids", $"i" + lit(2), size($"ids"))).as("id_b"))
      .distinct()
    val verified = smallPairs
      .join(toks.withColumnRenamed("id", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
      .join(toks.withColumnRenamed("id", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
      .withColumn("jaccard", Dedup.sortedJaccard($"toks_a", $"toks_b"))
      .where($"jaccard" >= 0.8)
      .select($"id_a", $"id_b")
    val big = buckets.where(size($"ids") > 1000)
    val star = big.select(
      element_at($"ids", 1).as("id_a"),
      explode(slice($"ids", lit(2), size($"ids") - 1)).as("id_b"))
      .distinct()
    val starVerified = star
      .join(toks.withColumnRenamed("id", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
      .join(toks.withColumnRenamed("id", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
      .withColumn("jaccard", Dedup.sortedJaccard($"toks_a", $"toks_b"))
      .where($"jaccard" >= 0.8)
      .select($"id_a", $"id_b")
    val starAll = star
      .join(toks.withColumnRenamed("id", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
      .join(toks.withColumnRenamed("id", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
      .withColumn("jaccard", Dedup.sortedJaccard($"toks_a", $"toks_b"))
      .select($"id_a", $"id_b", $"jaccard")
      .localCheckpoint()
    val bigB = big.withColumn("bid", monotonically_increasing_id()).localCheckpoint()
    val starB = bigB.select(
      $"bid",
      element_at($"ids", 1).as("id_a"),
      explode(slice($"ids", lit(2), size($"ids") - 1)).as("id_b"))
    val failed = starB.join(
      starAll.where($"jaccard" >= 0.8).select($"id_a", $"id_b"),
      Seq("id_a", "id_b"), "left_anti")
    val residue = failed
      .select($"bid", $"id_b".as("fid"))
      .join(bigB, "bid")
      .select($"fid", explode($"ids").as("other"))
      .where($"fid" =!= $"other")
      .select(least($"fid", $"other").as("id_a"), greatest($"fid", $"other").as("id_b"))
      .distinct()
    val residueEdges = residue
      .join(toks.withColumnRenamed("id", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
      .join(toks.withColumnRenamed("id", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
      .withColumn("jaccard", Dedup.sortedJaccard($"toks_a", $"toks_b"))
      .where($"jaccard" >= 0.8)
      .select($"id_a", $"id_b")
    val edges0 = verified
      .unionByName(starAll.where($"jaccard" >= 0.8).select($"id_a", $"id_b"))
      .unionByName(residueEdges).distinct()
      .select($"id_a".as("src"), $"id_b".as("dst"))
      .where($"src" =!= $"dst")
      .localCheckpoint()
    timed("edges0")(edges0.count())

    timed("production CC") {
      Dedup.connectedComponents(edges0, "src", "dst").localCheckpoint().count()
    }

    // per-round contraction with explicit timing
    var e: DataFrame = edges0
    var round = 0
    var done = false
    while (!done && round < 20) {
      val t0 = System.nanoTime()
      val sym = e.select(explode(array(
          struct($"src", $"dst"),
          struct($"dst".as("src"), $"src".as("dst")))).as("x"))
        .select($"x.src".as("src"), $"x.dst".as("dst"))
      val labels = sym.groupBy($"src".as("id"))
        .agg(least(first($"src"), min($"dst")).as("label"))
        .localCheckpoint()
      val nLabels = labels.count()
      val t1 = System.nanoTime()
      val contracted = e
        .join(labels.select($"id".as("src"), $"label".as("ls")), "src")
        .join(labels.select($"id".as("dst"), $"label".as("ld")), "dst")
        .where($"ls" =!= $"ld")
        .select(least($"ls", $"ld").as("src"), greatest($"ls", $"ld").as("dst"))
        .distinct()
        .localCheckpoint()
      val nEdges = contracted.count()
      val t2 = System.nanoTime()
      println(f"[prof] round $round: labels=$nLabels (${(t1 - t0) / 1e9}%.2fs) " +
        f"edges=$nEdges (${(t2 - t1) / 1e9}%.2fs)")
      e = contracted
      round += 1
      done = nEdges == 0
    }
    spark.stop()
  }
}
