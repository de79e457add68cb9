package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._
import graft.ops.Dedup

/** Dev tool: stage timing of the broadcast-regime minhash paths. */
object BcastProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs  $r")
      r
    }

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokenize(col("text")).as("toks"))
    val (toks0, small0, big0) = Dedup.minhashBuckets(docs, "doc_id", "toks", 128, 32, 1000)
    val (toks, small, big) = timed("minhashBuckets") {
      (toks0.localCheckpoint(), small0.localCheckpoint(), big0.localCheckpoint())
    }
    val smallCand = small
      .select(explode(org.apache.spark.sql.functions.expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x as _1, y as _2))))")).as("p"))
      .select($"p._1".as("id_a"), $"p._2".as("id_b"))
    timed("smallCand count")(smallCand.count())
    val bigPairs = big
      .select($"ids", posexplode($"ids").as(Seq("i", "id_a")))
      .where($"i" < size($"ids") - 1)
      .select($"id_a", slice($"ids", $"i" + lit(2), size($"ids")).as("tail"))
      .repartition(col("id_a"))
      .select($"id_a", explode($"tail").as("id_b"))
    timed("bigPairs count")(bigPairs.count())
    val cands = smallCand.unionByName(bigPairs)
    val verified = timed("broadcast verify") {
      Dedup.verifyPairsBroadcast(cands, toks, 0.8).localCheckpoint()
    }
    timed("verified count")(verified.count())
    timed("distinct")(verified.distinct().count())
    val edges = verified.select($"id_a", $"id_b").localCheckpoint()
    timed("cc")(Dedup.connectedComponents(edges, "id_a", "id_b").count())
    spark.stop()
  }
}
