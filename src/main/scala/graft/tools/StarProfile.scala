package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._
import graft.ops.Dedup

/** Dev tool: stage/round timing of the NEW multi-round star keepers
  * path at a given sf dir. Not part of the library.
  */
object StarProfile {
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

    val (toks, small, big) = timed("minhashBuckets") {
      val t = Dedup.minhashBuckets(docs, "doc_id", "toks", 128, 32, 1000)
      (t._1.localCheckpoint(), t._2.localCheckpoint(), t._3.localCheckpoint())
    }
    timed("toks/small/big counts")((toks.count(), small.count(), big.count()))

    val (starEdges, extraCand) = timed("bigBucketStarEdges rounds") {
      val (s, e) = Dedup.bigBucketStarEdges(big, toks, 0.8)
      (s.localCheckpoint(), e.localCheckpoint())
    }
    timed("star/extra counts")((starEdges.count(), extraCand.count()))

    val smallCand = small
      .select(explode(org.apache.spark.sql.functions.expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x as _1, y as _2))))")).as("p"))
      .select($"p._1".as("id_a"), $"p._2".as("id_b"))
    val allCand = timed("candidates distinct") {
      smallCand.unionByName(extraCand).distinct().localCheckpoint()
    }
    timed("allCand count")(allCand.count())

    val otherVerified = timed("verify chunked") {
      Dedup.verifyPairsChunked(allCand, toks, 0.8).localCheckpoint()
    }
    timed("otherVerified count")(otherVerified.count())

    val edges = starEdges
      .unionByName(otherVerified.select($"id_a", $"id_b")).localCheckpoint()
    timed("edges count")(edges.count())
    val comp = timed("connectedComponents") {
      Dedup.connectedComponents(edges, "id_a", "id_b").localCheckpoint()
    }
    timed("comp count")(comp.count())
    spark.stop()
  }
}
