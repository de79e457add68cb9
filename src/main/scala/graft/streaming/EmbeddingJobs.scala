package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.embed.{EmbeddingPipeline, EmbeddingRuntime, EmbeddingRuntimes}

/** Jobs-table daemon — the analog of the reference daemon's
  * `embedding_jobs` watcher (lantern_cli/src/daemon/embedding_jobs.rs:
  * 307-520; LISTEN/NOTIFY loop daemon/mod.rs:217-340): embedding work
  * is DECLARED as rows in a jobs table, a long-running watcher picks
  * up new rows, runs `create-embeddings` over the job's source table,
  * streams progress/status back to a status table, and lands per-row
  * failures in the job's failed-rows output — never failing the job
  * for a bad row.
  *
  * Spark-native mapping:
  *  - jobs table      → parquet dir of job rows; new files are the
  *                      notification channel (a file-source stream
  *                      polls it — the LISTEN/NOTIFY analog);
  *  - job runner      → [[EmbeddingPipeline.createEmbeddings]] over the
  *                      job's source, processed in id-hash chunks so
  *                      progress is reported incrementally like the
  *                      reference's row-count progress updates
  *                      (embedding_jobs.rs:430-476);
  *  - status updates  → append-only status log (job_id, seq, ...);
  *                      the LATEST row per job is its current state
  *                      (parquet is append-only — the log IS the
  *                      update history the reference keeps in-place);
  *  - failed rows     → `<resultsRoot>/job-<id>/failed` parquet
  *                      (the reference's per-job failed-rows table).
  */
object EmbeddingJobs {

  val JobSchema: StructType = StructType(Seq(
    StructField("job_id", LongType, nullable = false),
    StructField("src_path", StringType, nullable = false),
    StructField("id_col", StringType, nullable = false),
    StructField("text_col", StringType, nullable = false),
    StructField("runtime", StringType, nullable = false),
    StructField("model", StringType, nullable = false),
    // "embedding" | "completion" — one jobs table serves both families
    // exactly like the reference's embedding_generation_jobs.job_type
    // (lantern_extras/src/daemon.rs:122-227)
    StructField("job_type", StringType, nullable = false),
    StructField("system_prompt", StringType, nullable = true),
    StructField("submitted_at", LongType, nullable = false)))

  val StatusSchema: StructType = StructType(Seq(
    StructField("job_id", LongType, nullable = false),
    StructField("seq", IntegerType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("progress", IntegerType, nullable = false), // 0..100
    StructField("rows_done", LongType, nullable = false),
    StructField("rows_failed", LongType, nullable = false),
    StructField("error", StringType, nullable = true),
    StructField("updated_at", LongType, nullable = false)))

  /** Declare a job (an INSERT into the jobs table — `add_embedding_job`
    * / `add_completion_job`). Appends the row and a "queued" status. */
  def submit(
      spark: SparkSession,
      jobsDir: String,
      statusDir: String,
      jobId: Long,
      srcPath: String,
      idCol: String,
      textCol: String,
      runtime: String = "hash-mock",
      model: String = "mock/tiny",
      jobType: String = "embedding",
      systemPrompt: String = null): Unit = {
    require(jobType == "embedding" || jobType == "completion",
      s"graft: unknown job_type '$jobType' (embedding|completion)")
    // status row FIRST, jobs row second: the daemon only sees the job
    // once its file lands, so the runner's nextSeq is guaranteed to
    // read a max ABOVE the queued row — writing the jobs row first
    // would let a zero-interval daemon race submit and tie seqs.
    // nextSeq, not 0: a RESUBMITTED job's queued row must also outrank
    // the previous run's final row in status().
    appendStatus(spark, statusDir, jobId, nextSeq(spark, statusDir, jobId),
      "queued", 0, 0, 0, null)
    val row = Row(jobId, srcPath, idCol, textCol, runtime, model,
      jobType, systemPrompt, System.currentTimeMillis())
    spark.createDataFrame(java.util.List.of(row), JobSchema)
      .coalesce(1).write.mode("append").parquet(jobsDir)
  }

  private[streaming] def appendStatus(
      spark: SparkSession, statusDir: String, jobId: Long, seq: Int,
      status: String, progress: Int, done: Long, failed: Long,
      error: String): Unit = {
    val row = Row(jobId, seq, status, progress, done, failed, error,
      System.currentTimeMillis())
    spark.createDataFrame(java.util.List.of(row), StatusSchema)
      .coalesce(1).write.mode("append").parquet(statusDir)
  }

  /** Full status history (every transition, ordered by seq). */
  def statusLog(spark: SparkSession, statusDir: String): DataFrame =
    spark.read.schema(StatusSchema).parquet(statusDir)

  /** First seq a NEW run of `jobId` should emit. Seq must keep rising
    * across runs: a re-submitted (retry) job restarting at seq 1 would
    * leave the PREVIOUS run's final row as the max — a failed retry
    * would forever report the old run's "completed" through
    * [[status]]. */
  private[streaming] def nextSeq(
      spark: SparkSession, statusDir: String, jobId: Long): Int = {
    val fs = new org.apache.hadoop.fs.Path(statusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(statusDir))) 1
    else statusLog(spark, statusDir).where(col("job_id") === jobId)
      .agg(coalesce(max(col("seq")), lit(0))).head.getInt(0) + 1
  }

  /** Cancel a job (`cancel_embedding_job` / `cancel_completion_job`,
    * lantern_extras/src/daemon.rs:331-357): appends a "canceled" status
    * row. A queued job is skipped by the runner; a RUNNING job stops at
    * its next chunk boundary (the streaming-cancel analog — the
    * reference's cancellation token also interrupts between batches). */
  def cancel(spark: SparkSession, statusDir: String, jobId: Long): Unit = {
    // no-op for unknown jobs (the reference's UPDATE matches no row);
    // a FAILED job stays failed (its status CASE ranks failed above
    // canceled, daemon.rs:239-245). Completed jobs DO flip to canceled,
    // also per that CASE order. A resubmit after cancel supersedes the
    // cancel — the user re-requested the job. Cancellation is terminal
    // by STATE, not seq arithmetic: [[statusRank]] ranks 'canceled'
    // above anything a concurrently RUNNING job keeps appending in the
    // same run, however many chunks (and status rows) that run emits.
    val cur = currentStatus(spark, statusDir, jobId)
    if (cur.isEmpty || cur.contains("failed")) return
    appendStatus(spark, statusDir, jobId,
      nextSeq(spark, statusDir, jobId), "canceled", 0, 0, 0, null)
  }

  /** Terminal-state priority within a run: failed > canceled > the
    * rest (queued/running/completed resolve by seq). The reference's
    * status CASE order, daemon.rs:239-245. */
  private def statusPrio(status: String): Int = status match {
    case "failed" => 3
    case "canceled" => 2
    case _ => 1
  }

  /** The job's latest status, None for unknown jobs / missing dirs.
    * Filters by job_id BEFORE aggregating — an O(history) window over
    * every job's log would otherwise run once per chunk boundary.
    * Same ranking as [[status]]: runs are delimited by 'queued' rows
    * (submit() always writes one), the LATEST run wins, and within it
    * [[statusPrio]] makes failed/canceled terminal regardless of how
    * many higher-seq rows a concurrent runner appends. */
  private[streaming] def currentStatus(
      spark: SparkSession, statusDir: String, jobId: Long): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(statusDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    // one job's log is tiny (rows = its status transitions) — collect
    // and rank driver-side rather than spin up a window exchange per
    // chunk-boundary poll
    val rows = statusLog(spark, statusDir).where(col("job_id") === jobId)
      .select("seq", "status").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    if (rows.isEmpty) None
    else {
      var run = 0
      val ranked = rows.map { case (seq, st) =>
        if (st == "queued") run += 1
        ((run, statusPrio(st), seq), st)
      }
      Some(ranked.maxBy(_._1)._2)
    }
  }

  private[streaming] def isCanceled(
      spark: SparkSession, statusDir: String, jobId: Long): Boolean =
    currentStatus(spark, statusDir, jobId).contains("canceled")

  /** Current state per job. NOT simply the max-seq row: rows are
    * grouped into runs (each 'queued' row — one per submit — opens a
    * new one), the latest run wins, and within that run 'failed'
    * outranks 'canceled' outranks the seq-latest row. This makes
    * cancellation terminal by state: a concurrently running job keeps
    * appending progress rows with ever-higher seqs from its own
    * counter, and they must NOT flip a canceled job back to
    * running/completed (they lose on priority instead). A resubmit
    * opens a new run and supersedes the old run's terminal state. */
  def status(spark: SparkSession, statusDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val runW = Window.partitionBy(col("job_id")).orderBy(col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pickW = Window.partitionBy(col("job_id"))
      .orderBy(col("__run").desc, col("__prio").desc, col("seq").desc)
    statusLog(spark, statusDir)
      .withColumn("__run",
        sum(when(col("status") === "queued", 1).otherwise(0)).over(runW))
      .withColumn("__prio",
        when(col("status") === "failed", lit(3))
          .when(col("status") === "canceled", lit(2)).otherwise(lit(1)))
      .withColumn("__rn", row_number().over(pickW))
      .where(col("__rn") === 1).drop("__rn", "__run", "__prio")
  }

  /** Run one job to completion: running(0%) → chunked progress →
    * completed, or failed with the error message. Embeddings land in
    * `<resultsRoot>/job-<id>/embeddings`, per-row failures in
    * `.../failed`. */
  def runJob(
      spark: SparkSession,
      job: Row,
      statusDir: String,
      resultsRoot: String,
      chunks: Int = 4,
      resolve: String => EmbeddingRuntime = EmbeddingRuntimes.get): Unit = {
    val jobId = job.getLong(job.fieldIndex("job_id"))
    var seq = nextSeq(spark, statusDir, jobId) - 1
    def st(status: String, progress: Int, done: Long, failed: Long,
        error: String = null): Unit = {
      seq += 1
      appendStatus(spark, statusDir, jobId, seq, status, progress, done,
        failed, error)
    }
    // a canceled-while-queued job never starts (the reference skips
    // rows with canceled_at set)
    if (isCanceled(spark, statusDir, jobId)) return
    try {
      val srcPath = job.getString(job.fieldIndex("src_path"))
      val idCol = job.getString(job.fieldIndex("id_col"))
      val textCol = job.getString(job.fieldIndex("text_col"))
      val rt = resolve(job.getString(job.fieldIndex("runtime")))
      val model = job.getString(job.fieldIndex("model"))
      val jobType = job.getString(job.fieldIndex("job_type"))
      val sysPrompt =
        Option(job.getString(job.fieldIndex("system_prompt"))).getOrElse("")
      val src = spark.read.parquet(srcPath)
      val total = math.max(1L, src.count())
      st("running", 0, 0, 0)
      val out = s"$resultsRoot/job-$jobId"
      // a re-submitted job (the retry path) starts clean — the chunked
      // writes below APPEND, so leftovers from a half-failed earlier
      // run would otherwise duplicate result rows
      val outPath = new org.apache.hadoop.fs.Path(out)
      val ofs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (ofs.exists(outPath)) ofs.delete(outPath, true)
      val nChunks = math.max(1, chunks)
      // one dispatch per job, not two per chunk: the pipeline, success
      // column and output dir for this job_type
      val (run, valueCol, outDir): (DataFrame => DataFrame, String, String) =
        jobType match {
          case "completion" =>
            ((part: DataFrame) => EmbeddingPipeline
              .createCompletions(part, textCol, rt, model, sysPrompt),
              EmbeddingPipeline.CompletionCol, "completions")
          case _ =>
            ((part: DataFrame) => EmbeddingPipeline
              .createEmbeddings(part, textCol, rt, model),
              EmbeddingPipeline.EmbeddingCol, "embeddings")
        }
      var done = 0L
      var failedN = 0L
      var canceled = false
      (0 until nChunks).foreach { c =>
        // chunk-boundary cancellation — the cancellation-token analog;
        // the canceled status row a concurrent cancel() wrote stays the
        // job's final state (st() would outrank it, so stop emitting)
        if (!canceled && isCanceled(spark, statusDir, jobId)) canceled = true
        if (!canceled) {
          val part = src.where(pmod(xxhash64(col(idCol)), lit(nChunks)) === c)
          val processed = run(part).cache()
          try {
            EmbeddingPipeline.failedRows(processed)
              .select(col(idCol), col(EmbeddingPipeline.ErrorCol))
              .write.mode("append").parquet(s"$out/failed")
            EmbeddingPipeline.embeddedRows(processed)
              .select(col(idCol), col(valueCol))
              .write.mode("append").parquet(s"$out/$outDir")
            // both progress counters in ONE cached-scan agg (count of a
            // non-null column = failed rows) instead of two count() jobs
            val cnts = processed.agg(
              count(lit(1)), count(col(EmbeddingPipeline.ErrorCol))).head()
            done += cnts.getLong(0)
            failedN += cnts.getLong(1)
          } finally { processed.unpersist(); () }
          st("running", math.min(99, (done * 100 / total).toInt), done, failedN)
        }
      }
      if (!canceled) st("completed", 100, done, failedN)
    } catch {
      case e: Exception =>
        st("failed", 0, 0, 0,
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
    }
  }

  /** Start the daemon: a file-source stream over the jobs dir — each
    * new job row triggers `runJob` (the LISTEN/NOTIFY poll loop).
    * Returns the running query; caller owns its lifecycle. */
  def daemon(
      spark: SparkSession,
      jobsDir: String,
      statusDir: String,
      resultsRoot: String,
      checkpointDir: String,
      chunks: Int = 4,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      resolve: String => EmbeddingRuntime = EmbeddingRuntimes.get): StreamingQuery =
    watcher(spark, jobsDir, JobSchema, checkpointDir, trigger)(
      job => runJob(spark, job, statusDir, resultsRoot, chunks, resolve))

  /** Shared watcher loop for every job family: file-source stream over
    * a jobs dir, jobs within a micro-batch run serially in submit
    * order — the reference daemon also serializes per-listener job
    * handling. */
  private[streaming] def watcher(
      spark: SparkSession,
      jobsDir: String,
      schema: StructType,
      checkpointDir: String,
      trigger: Trigger)(runRow: Row => Unit): StreamingQuery = {
    spark.readStream.schema(schema).parquet(jobsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.orderBy(col("submitted_at"), col("job_id")).collect()
          .foreach(runRow)
      }
      .start()
  }
}
