package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.ann.{AnnIndex, AnnParams}
import graft.embed.HashEmbeddingRuntime

class IncrementalSpec extends SparkTestBase {

  test("streamed docs are embedded and become ANN-searchable; failures side-channel") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-stream").toString
    val indexPath = s"$tmp/idx"
    val failedPath = s"$tmp/failed"
    val rt = new HashEmbeddingRuntime()

    // initial corpus → base index
    val initial = Seq((1L, "first doc"), (2L, "second doc")).toDF("id", "text")
    val embedded0 = graft.embed.EmbeddingPipeline
      .createEmbeddings(initial, "text", rt, "mock/tiny")
    AnnIndex.build(
      graft.embed.EmbeddingPipeline.embeddedRows(embedded0),
      "id", graft.embed.EmbeddingPipeline.EmbeddingCol, indexPath,
      AnnParams(m = 8, numPartitions = 1))

    // stream two more docs + one failing (empty) doc
    val mem = MemoryStream[(Long, String)](spark)
    mem.addData((10L, "streamed doc ten"), (11L, "streamed doc eleven"), (12L, ""))
    val q = IncrementalPipeline.embedAndIndexStream(
      mem.toDF().toDF("id", "text"),
      "id", "text", rt, "mock/tiny",
      indexPath, failedPath, s"$tmp/ckpt",
      Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()

      // the streamed vector is now the nearest neighbor of its own embedding
      val qv = HashEmbeddingRuntime.embed("streamed doc ten", 8)
      val top = AnnIndex.search(spark, indexPath, qv, 1).head
      assert(top._1 === 10L && top._2 === 0.0)
      assert(AnnIndex.vectors(spark, indexPath).count() === 4)

      // failed row landed in the side channel
      val failed = spark.read.parquet(failedPath)
      assert(failed.select("id").collect().map(_.getLong(0)).toSeq === Seq(12L))

      // second micro-batch appends more delta shards
      mem.addData((20L, "late doc twenty"))
      q.processAllAvailable()
      val qv2 = HashEmbeddingRuntime.embed("late doc twenty", 8)
      assert(AnnIndex.search(spark, indexPath, qv2, 1).head._1 === 20L)
    } finally q.stop()

    // compaction merges deltas into fresh shards
    AnnIndex.consolidate(spark, indexPath, numPartitions = 2)
    assert(AnnIndex.vectors(spark, indexPath).count() === 5)
    val qv = HashEmbeddingRuntime.embed("streamed doc ten", 8)
    assert(AnnIndex.search(spark, indexPath, qv, 1).head._1 === 10L)
  }

  test("auto-compaction bounds shard count by corpus, not stream length") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-stream-compact").toString
    val indexPath = s"$tmp/idx"
    val rt = new HashEmbeddingRuntime()
    val initial = Seq((1L, "seed one"), (2L, "seed two")).toDF("id", "text")
    val embedded0 = graft.embed.EmbeddingPipeline
      .createEmbeddings(initial, "text", rt, "mock/tiny")
    AnnIndex.build(
      graft.embed.EmbeddingPipeline.embeddedRows(embedded0),
      "id", graft.embed.EmbeddingPipeline.EmbeddingCol, indexPath,
      AnnParams(m = 8, numPartitions = 1))

    val mem = MemoryStream[(Long, String)](spark)
    val q = IncrementalPipeline.embedAndIndexStream(
      mem.toDF().toDF("id", "text"),
      "id", "text", rt, "mock/tiny",
      indexPath, s"$tmp/failed", s"$tmp/ckpt",
      Trigger.ProcessingTime(0), consolidateOver = 2)
    try {
      // 6 one-doc micro-batches: without the in-batch guard this
      // leaves 1 base + 6 delta shards; with it the count re-bounds
      // every time it crosses the threshold
      (0 until 6).foreach { i =>
        mem.addData((100L + i, s"wave doc number $i"))
        q.processAllAvailable()
      }
      assert(AnnIndex.shardCount(spark, indexPath) <= 3,
        "shard count must stay a function of the threshold, not of " +
          "how many micro-batches have run")
      assert(AnnIndex.vectors(spark, indexPath).count() === 8)
      // nothing lost across the in-stream rebuilds: every wave doc is
      // still its own nearest neighbor
      (0 until 6).foreach { i =>
        val qv = HashEmbeddingRuntime.embed(s"wave doc number $i", 8)
        assert(AnnIndex.search(spark, indexPath, qv, 1).head._1 === 100L + i)
      }
    } finally q.stop()
  }
}
