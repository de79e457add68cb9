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
  * Compaction of accumulated delta shards is `AnnIndex.consolidate` —
  * schedule it like the reference schedules reindexing.
  */
object IncrementalPipeline {

  /** Start a stream that embeds `textCol` and appends (id, vector) delta
    * shards to the ANN index artifact at `indexPath` (which must exist —
    * build it from the initial corpus first). Returns the running query;
    * caller owns its lifecycle.
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
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
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
            }
          } finally { embedded.unpersist(); () }
        }
      }
      .start()
  }
}
