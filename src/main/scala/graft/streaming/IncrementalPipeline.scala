package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ann.AnnIndex
import graft.embed.{EmbeddingPipeline, EmbeddingRuntime}

/** Continuous ingestion — the Spark analog of the reference daemon
  * (lantern_cli/src/daemon/embedding_jobs.rs: LISTEN/NOTIFY row-level
  * re-embedding; SURVEY.md §2.7 maps it to Structured Streaming
  * `foreachBatch`). Each micro-batch runs the SAME batch operators —
  * embedding pipeline, then an incremental ANN append (`aminsert`
  * analog: delta shards, insert.c:51-262) — so streaming and batch
  * semantics cannot drift. Failed embeds append to a parquet side
  * channel (the daemon's failed-rows table).
  *
  * Compaction of accumulated delta shards is built in: each append
  * that pushes the shard count past the threshold triggers
  * `AnnIndex.consolidate` inside the same micro-batch (the façade's
  * insert-path guard, applied to the stream) — without it a feed of
  * thousands of micro-batches grows thousands of delta shards and
  * search fan-out rises linearly with stream LENGTH instead of data
  * volume. The rebuild target is sized by live row volume (~1M
  * rows/shard, the build-time guidance), so the artifact's layout is
  * a function of corpus size, not of how it arrived.
  */
object IncrementalPipeline {

  /** Start a stream that embeds `textCol` and appends (id, vector) delta
    * shards to the ANN index artifact at `indexPath` (which must exist —
    * build it from the initial corpus first). Returns the running query;
    * caller owns its lifecycle. `consolidateOver` = 0 reads the
    * `spark.graft.ann.consolidateShards` conf; past it, the batch that
    * crossed the line compacts before committing. Pass a NEGATIVE
    * value to disable in-stream compaction entirely — the right mode
    * when an external job already schedules `AnnIndex.consolidate`
    * (two concurrent delete-and-rename rebuilds of the same artifact
    * root would race each other).
    */
  def embedAndIndexStream(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      runtime: EmbeddingRuntime,
      model: String,
      indexPath: String,
      failedRowsPath: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      consolidateOver: Int = 0): StreamingQuery = {
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val embedded = EmbeddingPipeline
            .createEmbeddings(batch, textCol, runtime, model)
            .cache()
          try {
            EmbeddingPipeline.failedRows(embedded)
              .withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(failedRowsPath)
            val ok = EmbeddingPipeline.embeddedRows(embedded)
              .select(col(idCol), col(EmbeddingPipeline.EmbeddingCol))
            if (!ok.isEmpty) {
              AnnIndex.append(ok, idCol, EmbeddingPipeline.EmbeddingCol, indexPath)
              val s = batch.sparkSession
              val threshold =
                if (consolidateOver > 0) consolidateOver
                else if (consolidateOver < 0) Int.MaxValue // disabled
                else graft.GraftConf.annConsolidateShards(s)
              if (AnnIndex.shardCount(s, indexPath) > threshold) {
                // one distributed count over the artifact, only on the
                // (rare) batch that crossed the line — sizes the
                // rebuild by corpus volume, not stream length
                val rows = AnnIndex.vectors(s, indexPath).count()
                AnnIndex.consolidate(s, indexPath,
                  math.max(1, math.ceil(rows / 1e6).toInt))
              }
            }
          } finally { embedded.unpersist(); () }
        }
      }
      .start()
  }
}
