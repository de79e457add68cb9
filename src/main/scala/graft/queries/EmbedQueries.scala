package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.embed.{EmbeddingPipeline, HashEmbeddingRuntime}

/** Driver-checkable query for the embedding pipeline (SURVEY.md §2.6).
  * The deterministic hash runtime makes the whole pipeline — batching,
  * success path, failed-row side output — exactly recomputable in the
  * DuckDB oracle.
  */
object EmbedQueries {

  private def embedPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val out = EmbeddingPipeline.createEmbeddings(
      docs, "text", new HashEmbeddingRuntime(), "mock/tiny")
    // components are exact binary fractions (k/1024) — no rounding
    // needed for a bit-identical oracle compare
    out.select(
        col("doc_id"),
        element_at(col(EmbeddingPipeline.EmbeddingCol), 1).cast("double").as("e0"),
        element_at(col(EmbeddingPipeline.EmbeddingCol), 2).cast("double").as("e1"),
        element_at(col(EmbeddingPipeline.EmbeddingCol), 8).cast("double").as("e7"),
        col(EmbeddingPipeline.ErrorCol).isNotNull.cast("int").as("failed"))
      .orderBy("doc_id")
  }

  private val oracle: String = {
    def e(j: Int) =
      s"CAST(${HashEmbeddingRuntime.embedSql("text", j)} AS DOUBLE)"
    s"""SELECT doc_id,
       |CASE WHEN text IS NULL OR length(text) = 0 THEN NULL ELSE ${e(0)} END AS e0,
       |CASE WHEN text IS NULL OR length(text) = 0 THEN NULL ELSE ${e(1)} END AS e1,
       |CASE WHEN text IS NULL OR length(text) = 0 THEN NULL ELSE ${e(7)} END AS e7,
       |CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END AS failed
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Full jobs-table daemon cycle, driver-gated: submit a job row over
    * the documents table, let the file-source watcher pick it up, run
    * it chunked with progress/status updates, then emit per-doc
    * embeddings joined with the job's FINAL status — all exactly
    * recomputable by the oracle (deterministic runtime + constant
    * status columns). A fresh temp workspace per invocation keeps the
    * query re-runnable inside one session (Bench reps + warmup).
    */
  private def embeddingJobs(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EmbeddingJobs
    val root = java.nio.file.Files.createTempDirectory("graft-ejobs").toString
    EmbeddingJobs.submit(s, s"$root/jobs", s"$root/status", 1L,
      s"$dir/documents.parquet", "doc_id", "text")
    val q = EmbeddingJobs.daemon(s, s"$root/jobs", s"$root/status",
      s"$root/results", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    val emb = s.read.parquet(s"$root/results/job-1/embeddings")
      .select(col("doc_id"),
        element_at(col(EmbeddingPipeline.EmbeddingCol), 1).cast("double").as("e0"),
        element_at(col(EmbeddingPipeline.EmbeddingCol), 8).cast("double").as("e7"))
    val failed = s.read.parquet(s"$root/results/job-1/failed")
      .select(col("doc_id"), lit(1).as("failed"))
    val st = EmbeddingJobs.status(s, s"$root/status")
      .where(col("job_id") === 1)
      .select(col("status").as("job_status"), col("progress").as("job_progress"))
    Tables.documents(s, dir).select("doc_id")
      .join(emb, Seq("doc_id"), "left")
      .join(failed, Seq("doc_id"), "left")
      .crossJoin(broadcast(st))
      .select(col("doc_id"), col("e0"), col("e7"),
        coalesce(col("failed"), lit(0)).as("failed"),
        col("job_status"), col("job_progress"))
      .orderBy("doc_id")
  }

  private val jobsOracle: String = {
    def e(j: Int) =
      s"CAST(${HashEmbeddingRuntime.embedSql("text", j)} AS DOUBLE)"
    s"""SELECT doc_id,
       |CASE WHEN text IS NULL OR length(text) = 0 THEN NULL ELSE ${e(0)} END AS e0,
       |CASE WHEN text IS NULL OR length(text) = 0 THEN NULL ELSE ${e(7)} END AS e7,
       |CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END AS failed,
       |'completed' AS job_status, 100 AS job_progress
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Completion-job family through the same daemon (`add_completion_job`
    * analog): submit with job_type=completion, run, emit per-doc
    * completions + final status. The mock runtime's completion is a
    * pure string function, so the whole cycle is hash-checked. */
  private def completionJobs(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EmbeddingJobs
    val root = java.nio.file.Files.createTempDirectory("graft-cjobs").toString
    EmbeddingJobs.submit(s, s"$root/jobs", s"$root/status", 1L,
      s"$dir/documents.parquet", "doc_id", "text",
      jobType = "completion", systemPrompt = "sys")
    val q = EmbeddingJobs.daemon(s, s"$root/jobs", s"$root/status",
      s"$root/results", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    val comp = s.read.parquet(s"$root/results/job-1/completions")
      .select(col("doc_id"), col(EmbeddingPipeline.CompletionCol).as("completion"))
    val st = EmbeddingJobs.status(s, s"$root/status")
      .where(col("job_id") === 1)
      .select(col("status").as("job_status"))
    Tables.documents(s, dir).select("doc_id")
      .join(comp, Seq("doc_id"), "left")
      .crossJoin(broadcast(st))
      .orderBy("doc_id")
  }

  private val completionJobsOracle =
    """SELECT doc_id,
      |  CASE WHEN text IS NULL OR length(text) = 0 THEN NULL
      |    ELSE '[hash-mock/mock/tiny] ' || substr(text, 1, 80) END AS completion,
      |  'completed' AS job_status
      |FROM documents ORDER BY doc_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("embed_pipeline", Some(oracle), embedPipeline),
    QueryDef("embedding_jobs", Some(jobsOracle), embeddingJobs),
    QueryDef("completion_jobs", Some(completionJobsOracle), completionJobs),
  )
}
