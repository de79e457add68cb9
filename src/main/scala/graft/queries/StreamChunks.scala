package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Chunked-parquet FILE-source harness for the streaming gates — the
  * production feed shape: the stream input is never materialized on
  * the driver; chunks are written once per dataset (fingerprinted
  * cache, a pure function of the source table), and each run copies
  * them into a fresh source directory one file per trigger
  * (file-source offsets are per-directory, so they never reuse).
  * Chunk order IS event-time order: copying time-contiguous files
  * one per `processAllAvailable` reproduces a tailed event log, the
  * across-batch ordering the stateful operators document.
  */
private[queries] object StreamChunks {

  /** Write the chunk directories (once, cached) and return the one
    * parquet file of each in feed order. */
  def materialize(chunkRoot: String, chunks: Seq[() => DataFrame]): Seq[java.io.File] = {
    AnnQueries.cached(chunkRoot) {
      chunks.zipWithIndex.foreach { case (mk, c) =>
        mk().coalesce(1).write.mode("overwrite").parquet(f"$chunkRoot/c$c%02d")
      }
    }
    chunks.indices.map { c =>
      new java.io.File(f"$chunkRoot/c$c%02d").listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .minBy(_.getName)
    }
  }

  /** Fresh per-run source directory + its file-source reader
    * (`maxFilesPerTrigger 1` — one chunk per micro-batch). */
  def source(s: SparkSession, schema: StructType): (String, DataFrame) = {
    val streamDir = java.nio.file.Files
      .createTempDirectory("graft-fsrc").toString
    val src = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir)
    (streamDir, src)
  }

  /** Copy one chunk file per trigger, stop the query, delete the
    * per-run source dir. */
  def drive(q: StreamingQuery, streamDir: String, files: Seq[java.io.File]): Unit =
    try {
      files.zipWithIndex.foreach { case (f, c) =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(streamDir, f"chunk$c%02d.parquet"))
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      graft.util.Files.deleteRecursively(new java.io.File(streamDir))
    }
}
