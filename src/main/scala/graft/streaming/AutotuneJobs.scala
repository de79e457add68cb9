package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.ann.Autotune

/** Autotune jobs table + watcher — the daemon's second job family
  * (`lantern_cli/src/daemon/autotune_jobs.rs:59-90` job row shape,
  * `autotune_job_processor` :93-253): an autotune run is declared as a
  * row (source table, column, metric, target recall, k,
  * create_index), the watcher picks it up, runs the reference
  * parameter grid, writes the per-variant report to the job's results
  * dir, optionally promotes the winning index, and streams status
  * through the same append-only status log as [[EmbeddingJobs]].
  */
object AutotuneJobs {

  val JobSchema: StructType = StructType(Seq(
    StructField("job_id", LongType, nullable = false),
    StructField("src_path", StringType, nullable = false),
    StructField("id_col", StringType, nullable = false),
    StructField("vec_col", StringType, nullable = false),
    StructField("metric", StringType, nullable = false),
    StructField("target_recall", DoubleType, nullable = false),
    StructField("k", IntegerType, nullable = false),
    StructField("create_index", BooleanType, nullable = false),
    StructField("index_path", StringType, nullable = true),
    StructField("submitted_at", LongType, nullable = false)))

  def submit(
      spark: SparkSession,
      jobsDir: String,
      statusDir: String,
      jobId: Long,
      srcPath: String,
      idCol: String,
      vecCol: String,
      metric: String = "l2sq",
      targetRecall: Double = 0.9,
      k: Int = 10,
      createIndex: Boolean = false,
      indexPath: String = null): Unit = {
    // status row first, jobs row second (see EmbeddingJobs.submit: the
    // runner's nextSeq must read a max above the queued row); nextSeq,
    // not 0, so a resubmit's queued row outranks the previous run
    EmbeddingJobs.appendStatus(spark, statusDir, jobId,
      EmbeddingJobs.nextSeq(spark, statusDir, jobId), "queued", 0, 0, 0, null)
    val row = Row(jobId, srcPath, idCol, vecCol, metric, targetRecall, k,
      createIndex, indexPath, System.currentTimeMillis())
    spark.createDataFrame(java.util.List.of(row), JobSchema)
      .coalesce(1).write.mode("append").parquet(jobsDir)
  }

  /** Run one autotune job: running → grid report written (progress
    * 50) → optional winning-index promote → completed; failures land
    * as status failed with the error. */
  def runJob(
      spark: SparkSession,
      job: Row,
      statusDir: String,
      resultsRoot: String): Unit = {
    val jobId = job.getLong(job.fieldIndex("job_id"))
    // a canceled-while-queued job never starts (same contract as
    // EmbeddingJobs.runJob) — especially important here, where running
    // anyway could PROMOTE an index over index_path the user canceled
    if (EmbeddingJobs.isCanceled(spark, statusDir, jobId)) return
    // continue the seq past any earlier run's rows (see EmbeddingJobs.nextSeq)
    var seq = EmbeddingJobs.nextSeq(spark, statusDir, jobId) - 1
    def st(status: String, progress: Int, error: String = null): Unit = {
      seq += 1
      EmbeddingJobs.appendStatus(spark, statusDir, jobId, seq, status,
        progress, 0, 0, error)
    }
    try {
      val src = spark.read.parquet(job.getString(job.fieldIndex("src_path")))
      val idCol = job.getString(job.fieldIndex("id_col"))
      val vecCol = job.getString(job.fieldIndex("vec_col"))
      val metric = job.getString(job.fieldIndex("metric"))
      val recall = job.getDouble(job.fieldIndex("target_recall"))
      val k = job.getInt(job.fieldIndex("k"))
      val createIndex = job.getBoolean(job.fieldIndex("create_index"))
      st("running", 0)
      val out = s"$resultsRoot/job-$jobId"
      val report =
        if (createIndex) {
          // re-check right before the DESTRUCTIVE step: create promotes
          // the winner over index_path by delete+rename
          if (EmbeddingJobs.isCanceled(spark, statusDir, jobId)) return
          val idx = Option(job.getString(job.fieldIndex("index_path")))
            .getOrElse(s"$out/index")
          Autotune.autotuneCreate(src, idCol, vecCol, idx, metric,
            k = k, targetRecall = recall)
        } else {
          Autotune.autotune(src, idCol, vecCol, metric,
            k = k, targetRecall = recall)
        }
      if (EmbeddingJobs.isCanceled(spark, statusDir, jobId)) return
      st("running", 50)
      Autotune.reportDf(spark, report).withColumn("job_id", lit(jobId))
        .coalesce(1).write.mode("overwrite").parquet(s"$out/report")
      st("completed", 100)
    } catch {
      case e: Exception =>
        st("failed", 0,
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
    }
  }

  /** Watcher over the autotune jobs dir (the shared
    * [[EmbeddingJobs.watcher]] loop). */
  def daemon(
      spark: SparkSession,
      jobsDir: String,
      statusDir: String,
      resultsRoot: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    EmbeddingJobs.watcher(spark, jobsDir, JobSchema, checkpointDir, trigger)(
      job => runJob(spark, job, statusDir, resultsRoot))
}
