package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for the dedup_minhash_keepers_scale
  * gate (the bench record's top row): prints wall per phase so the
  * cost can be trimmed where the time actually goes. Not part of the
  * verified surface. */
object TimeKeepers {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("time-keepers").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tk] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.functions.tokenize(col("text")).as("toks"))
    val n = timed("docs-count")(docs.count())
    val budget = math.max(20000L, (n * n) / 12500L * 1000L)
    println(s"[tk] n=$n budget=$budget")

    // sub-phases of the signature pipeline
    timed("tokenize-only") {
      docs.agg(sum(size(col("toks")))).head()
    }
    timed("tokhash-only") {
      docs.select(
          org.apache.spark.sql.graftshim.GraftSqlShim.column(
            graft.ops.SortedTokenHashes(
              org.apache.spark.sql.graftshim.GraftSqlShim.expression(
                col("toks")))).as("th"))
        .agg(sum(size(col("th")))).head()
    }
    timed("sig-only") {
      docs.select(Dedup.minhashSignature(col("toks"), 128).as("sig"))
        .agg(sum(size(col("sig")))).head()
    }

    // phase: signatures + banded buckets (small / big split)
    val (toks, small, big) = timed("minhashBuckets") {
      val r = Dedup.minhashBuckets(docs, "doc_id", "toks", 128, 32, 100)
      (r._1.localCheckpoint(), r._2.localCheckpoint(), r._3.localCheckpoint())
    }
    println(s"[tk] small=${small.count()} big=${big.count()}")

    // phase: star rounds + leftover candidates (the scale branch)
    val (starEdges, extraCand) = timed("bigBucketStarEdges") {
      val r = Dedup.bigBucketStarEdges(big, toks, 0.8, 16, budget)
      (r._1.localCheckpoint(), r._2.localCheckpoint())
    }
    println(s"[tk] starEdges=${starEdges.count()} extraCand=${extraCand.count()}")

    // phase: the chunked verifier over the leftover set
    val verified = timed("verifyPairsChunked") {
      Dedup.verifyPairsChunked(extraCand, toks, 0.8).localCheckpoint()
    }
    println(s"[tk] verified=${verified.count()}")

    // end-to-end, exactly the gate's shape
    spark.conf.set(graft.GraftConf.DedupBroadcastBytes, "0")
    timed("keepers-full") {
      Dedup.minhashDedupKeepers(docs, "doc_id", "toks", 0.8,
        maxBucket = 100, leftoverPairBudget = budget).count()
    }
    timed("keepers-full-2nd") {
      Dedup.minhashDedupKeepers(docs, "doc_id", "toks", 0.8,
        maxBucket = 100, leftoverPairBudget = budget).count()
    }
    spark.stop()
  }
}
