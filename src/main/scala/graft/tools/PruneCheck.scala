package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._
import graft.ops.Dedup

/** Dev tool: sanity-check the bridge reverse-triangle prune — find
  * candidate pairs the prune drops that still verify at threshold, and
  * print their anchor jaccards. Should be EMPTY if jaccard distance
  * triangle inequality holds as assumed. Not part of the library.
  */
object PruneCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val threshold = 0.8

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokenize(col("text")).as("toks"))
    val (toks0, small, big) = Dedup.minhashBuckets(docs, "doc_id", "toks", 128, 32, 1000)
    val toks = toks0.localCheckpoint()

    // replicate one star round by hand
    val unassigned = big.withColumn("bid", monotonically_increasing_id())
      .select($"bid", explode($"ids").as("id")).localCheckpoint()
    val anchors = unassigned.groupBy($"bid").agg(min($"id").as("anchor")).localCheckpoint()
    val cand = unassigned.join(anchors, "bid").where($"id" =!= $"anchor")
    val vj = Dedup.verifyPairsChunked(
      cand.select($"anchor".as("id_a"), $"id".as("id_b")), toks, 2 * threshold - 1)
      .localCheckpoint()
    val assigned = vj.where($"jaccard" >= threshold)
    val groups = anchors.select($"bid", $"anchor".as("gid"), lit(1.0).as("gj"))
      .unionByName(assigned.select($"id_b".as("gid"), $"jaccard".as("gj"))
        .join(unassigned.select($"bid", $"id".as("gid")), "gid")
        .select($"bid", $"gid", $"gj")).localCheckpoint()
    val mids = vj.where($"jaccard" < threshold)
      .select($"id_b".as("id"), $"jaccard".as("mj"))
      .join(unassigned, "id").select($"bid", $"id", $"mj").localCheckpoint()

    val allBridge = mids.join(groups, "bid").where($"id" =!= $"gid")
    val pruned = allBridge.where($"gj" > $"mj" + lit(1.0 - threshold))
      .select(least($"id", $"gid").as("id_a"), greatest($"id", $"gid").as("id_b"),
        $"id".as("mid_id"), $"gid".as("group_id"), $"mj", $"gj")
      .localCheckpoint()
    println(s"[chk] pruned pairs: ${pruned.count()}")
    val verifiedPruned = Dedup.verifyPairsChunked(
      pruned.select($"id_a", $"id_b").distinct(), toks, threshold).localCheckpoint()
    println(s"[chk] pruned-but-TRUE pairs: ${verifiedPruned.count()}")
    verifiedPruned.join(pruned, Seq("id_a", "id_b"))
      .select($"id_a", $"id_b", $"jaccard", $"mj", $"gj")
      .show(10, false)
    spark.stop()
  }
}
