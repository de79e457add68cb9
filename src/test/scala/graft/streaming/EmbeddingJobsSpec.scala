package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.embed.HashEmbeddingRuntime

/** End-to-end jobs-table daemon: submit → watcher picks up → embeddings
  * + failed rows land → status transitions queued → running(progress) →
  * completed; a broken job ends failed with its error; jobs submitted
  * AFTER the daemon started are still picked up (the watch semantics).
  */
class EmbeddingJobsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-jobs").toFile, name).toString

  test("daemon runs submitted jobs with progress, failures and status") {
    val root = tmp("d1")
    val jobs = s"$root/jobs"; val status = s"$root/status"
    val results = s"$root/results"; val ckpt = s"$root/ckpt"
    // source: 20 docs, two of them empty → per-row embed failures
    val src = s"$root/src"
    (0 until 20).map(i => (i.toLong, if (i % 10 == 3) "" else s"doc number $i"))
      .toDF("doc_id", "text").write.parquet(src)

    EmbeddingJobs.submit(spark, jobs, status, 1L, src, "doc_id", "text")
    val q = EmbeddingJobs.daemon(spark, jobs, status, results, ckpt)
    try {
      q.processAllAvailable()

      // job 2 arrives while the daemon is live — must also run
      EmbeddingJobs.submit(spark, jobs, status, 2L, src, "doc_id", "text",
        model = "mock/base")
      q.processAllAvailable()
    } finally q.stop()

    // ---- results: embeddings match the deterministic runtime exactly
    val emb = spark.read.parquet(s"$results/job-1/embeddings")
    assert(emb.count() == 18)
    val got = emb.where(col("doc_id") === 7)
      .head().getSeq[Float](1).toArray
    assert(got.sameElements(HashEmbeddingRuntime.embed("doc number 7", 8)))
    assert(spark.read.parquet(s"$results/job-2/embeddings").count() == 18)

    // ---- failed rows side table
    val failed = spark.read.parquet(s"$results/job-1/failed")
    assert(failed.select("doc_id").as[Long].collect().toSet == Set(3L, 13L))

    // ---- status: latest is completed/100 with honest counts
    val cur = EmbeddingJobs.status(spark, status)
      .select("job_id", "status", "progress", "rows_done", "rows_failed")
      .as[(Long, String, Int, Long, Long)].collect().toMap2
    assert(cur(1L) == (("completed", 100, 20L, 2L)))
    assert(cur(2L) == (("completed", 100, 20L, 2L)))

    // ---- transition log: queued → running(0) → increasing progress →
    // completed, strictly ordered by seq
    val log = EmbeddingJobs.statusLog(spark, status)
      .where(col("job_id") === 1).orderBy(col("seq"))
      .select("status", "progress").as[(String, Int)].collect().toSeq
    assert(log.head == (("queued", 0)))
    assert(log.last == (("completed", 100)))
    assert(log.exists { case (s, p) => s == "running" && p == 0 })
    val progresses = log.collect { case ("running", p) => p }
    assert(progresses == progresses.sorted, s"monotone progress: $progresses")
  }

  test("a job with a missing source ends failed with the error recorded") {
    val root = tmp("d2")
    val jobs = s"$root/jobs"; val status = s"$root/status"
    EmbeddingJobs.submit(spark, jobs, status, 9L, s"$root/nope", "id", "text")
    val q = EmbeddingJobs.daemon(spark, jobs, status, s"$root/results", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    val row = EmbeddingJobs.status(spark, status)
      .where(col("job_id") === 9)
      .select("status", "error").as[(String, String)].head()
    assert(row._1 == "failed" && row._2 != null && row._2.nonEmpty)
  }

  test("a retry's status supersedes the earlier run's (seq keeps rising)") {
    val root = tmp("d4")
    val jobs = s"$root/jobs"; val status = s"$root/status"
    val src = s"$root/src"
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text").write.parquet(src)
    // run 1 completes
    EmbeddingJobs.submit(spark, jobs, status, 3L, src, "id", "text")
    val q1 = EmbeddingJobs.daemon(spark, jobs, status, s"$root/results", s"$root/ckpt1")
    try q1.processAllAvailable() finally q1.stop()
    assert(EmbeddingJobs.status(spark, status).where(col("job_id") === 3)
      .select("status").as[String].head() == "completed")
    // retry fails (source removed) — its rows must OUTRANK run 1's
    // final "completed" row, not restart at seq 1 below it
    val fs = new java.io.File(src)
    fs.listFiles().foreach(_.delete()); fs.delete()
    EmbeddingJobs.submit(spark, jobs, status, 3L, src, "id", "text")
    val q2 = EmbeddingJobs.daemon(spark, jobs, status, s"$root/results", s"$root/ckpt2")
    try q2.processAllAvailable() finally q2.stop()
    val cur = EmbeddingJobs.status(spark, status).where(col("job_id") === 3)
      .select("status").as[String].head()
    assert(cur == "failed", s"retry outcome shadowed: $cur")
  }

  test("completion jobs run through the same daemon with failed-row capture") {
    val root = tmp("d6")
    val jobs = s"$root/jobs"; val status = s"$root/status"
    val src = s"$root/src"
    Seq((1L, "summarize this"), (2L, null: String), (3L, "another prompt"))
      .toDF("id", "text").write.parquet(src)
    EmbeddingJobs.submit(spark, jobs, status, 4L, src, "id", "text",
      jobType = "completion", systemPrompt = "be brief")
    val q = EmbeddingJobs.daemon(spark, jobs, status, s"$root/results", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    val out = spark.read.parquet(s"$root/results/job-4/completions")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "[hash-mock/mock/tiny] summarize this")
    assert(out(3L) == "[hash-mock/mock/tiny] another prompt")
    assert(!out.contains(2L)) // null prompt → failed side output
    assert(spark.read.parquet(s"$root/results/job-4/failed").count() == 1)
    assert(EmbeddingJobs.status(spark, status).where(col("job_id") === 4)
      .select("status").as[String].head() == "completed")
  }

  test("cancel: a queued job never runs; status stays canceled") {
    val root = tmp("d7")
    val jobs = s"$root/jobs"; val status = s"$root/status"
    val src = s"$root/src"
    Seq((1L, "alpha")).toDF("id", "text").write.parquet(src)
    EmbeddingJobs.submit(spark, jobs, status, 5L, src, "id", "text")
    EmbeddingJobs.cancel(spark, status, 5L)
    val q = EmbeddingJobs.daemon(spark, jobs, status, s"$root/results", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(EmbeddingJobs.status(spark, status).where(col("job_id") === 5)
      .select("status").as[String].head() == "canceled")
    assert(!new java.io.File(s"$root/results/job-5").exists())
  }

  test("cancel mid-run stops at the chunk boundary; terminal semantics") {
    val root = tmp("d8")
    val jobs = s"$root/jobs"; val status = s"$root/status"
    val src = s"$root/src"
    (0 until 20).map(i => (i.toLong, s"text $i")).toDF("id", "text")
      .write.parquet(src)
    EmbeddingJobs.submit(spark, jobs, status, 6L, src, "id", "text")
    // cancel DURING the job: resolve runs after the queued-state check,
    // so the chunk-0 boundary check is what must catch it
    val job = spark.read.schema(EmbeddingJobs.JobSchema).parquet(jobs).head()
    EmbeddingJobs.runJob(spark, job, status, s"$root/results",
      resolve = name => {
        EmbeddingJobs.cancel(spark, status, 6L)
        graft.embed.EmbeddingRuntimes.get(name)
      })
    val log = EmbeddingJobs.statusLog(spark, status)
      .where(col("job_id") === 6).select("status").as[String].collect().toSet
    assert(EmbeddingJobs.status(spark, status).where(col("job_id") === 6)
      .select("status").as[String].head() == "canceled")
    assert(!log.contains("completed"), log.toString) // never completed
    // no chunk output was written after the cancel
    assert(!new java.io.File(s"$root/results/job-6/embeddings").exists())

    // canceling a FAILED job keeps failed (reference status priority)
    EmbeddingJobs.submit(spark, jobs, status, 8L, s"$root/nope", "id", "text")
    val failJob = spark.read.schema(EmbeddingJobs.JobSchema).parquet(jobs)
      .where(col("job_id") === 8).head()
    EmbeddingJobs.runJob(spark, failJob, status, s"$root/results")
    EmbeddingJobs.cancel(spark, status, 8L)
    assert(EmbeddingJobs.status(spark, status).where(col("job_id") === 8)
      .select("status").as[String].head() == "failed")
    // canceling an unknown job is a no-op
    EmbeddingJobs.cancel(spark, status, 999L)
    assert(EmbeddingJobs.status(spark, status)
      .where(col("job_id") === 999).count() == 0)
  }

  test("canceled is terminal by state: late high-seq runner rows cannot flip it") {
    val root = tmp("d9")
    val status = s"$root/status"
    EmbeddingJobs.appendStatus(spark, status, 11L, 1, "queued", 0, 0, 0, null)
    EmbeddingJobs.appendStatus(spark, status, 11L, 2, "running", 0, 0, 0, null)
    EmbeddingJobs.cancel(spark, status, 11L)
    // a concurrent runner with chunks >> 1000 keeps appending from its
    // own counter, far past the canceled row's seq — these rows must
    // lose on state priority, not on seq arithmetic
    EmbeddingJobs.appendStatus(spark, status, 11L, 1400, "running", 50, 10, 0, null)
    EmbeddingJobs.appendStatus(spark, status, 11L, 1500, "completed", 100, 20, 0, null)
    assert(EmbeddingJobs.status(spark, status).where(col("job_id") === 11)
      .select("status").as[String].head() == "canceled")
    assert(EmbeddingJobs.isCanceled(spark, status, 11L))
    // a resubmit opens a new run and supersedes the cancel
    EmbeddingJobs.appendStatus(spark, status, 11L, 1501, "queued", 0, 0, 0, null)
    assert(EmbeddingJobs.status(spark, status).where(col("job_id") === 11)
      .select("status").as[String].head() == "queued")
    assert(!EmbeddingJobs.isCanceled(spark, status, 11L))
  }

  test("a resubmit's queued row immediately outranks the old run's final row") {
    val root = tmp("d5")
    val jobs = s"$root/jobs"; val status = s"$root/status"
    val src = s"$root/src"
    Seq((1L, "alpha")).toDF("id", "text").write.parquet(src)
    EmbeddingJobs.submit(spark, jobs, status, 7L, src, "id", "text")
    val q = EmbeddingJobs.daemon(spark, jobs, status, s"$root/results", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    // resubmit BEFORE any daemon runs it: status must already read
    // "queued", not the old run's "completed"
    EmbeddingJobs.submit(spark, jobs, status, 7L, src, "id", "text")
    val cur = EmbeddingJobs.status(spark, status).where(col("job_id") === 7)
      .select("status").as[String].head()
    assert(cur == "queued", s"stale status after resubmit: $cur")
  }

  test("autotune jobs: grid report, winner promote, status transitions") {
    import org.apache.spark.sql.functions.col
    val root = tmp("d3")
    val jobs = s"$root/jobs"; val status = s"$root/status"
    // clustered vectors so recall targets are reachable with a tiny grid
    val rnd = new scala.util.Random(11)
    val src = s"$root/vecs"
    (0 until 300).map { i =>
      val base = Array.fill(16)(0.0f)
      base(i % 8) = 1.0f
      (i.toLong, base.map(x => x + rnd.nextFloat() * 0.05f).toSeq)
    }.toDF("id", "vec").write.parquet(src)

    AutotuneJobs.submit(spark, jobs, status, 5L, src, "id", "vec",
      targetRecall = 0.5, createIndex = true)
    val q = AutotuneJobs.daemon(spark, jobs, status, s"$root/results",
      s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()

    val cur = EmbeddingJobs.status(spark, status)
      .where(col("job_id") === 5)
      .select("status", "progress").as[(String, Int)].head()
    assert(cur == (("completed", 100)),
      EmbeddingJobs.statusLog(spark, status).collect().mkString("; "))
    val report = spark.read.parquet(s"$root/results/job-5/report")
    assert(report.count() >= 2) // early-exit grid still tried >= 2 variants
    assert(report.where(col("picked")).count() == 1)
    // the promoted index answers searches
    val probe = spark.read.parquet(src).where(col("id") === 7)
      .select("vec").head().getSeq[Float](0).toArray
    val got = graft.ann.AnnIndex.search(spark, s"$root/results/job-5/index",
      probe, 5).map(_._1)
    assert(got.contains(7L), got.toSeq.toString)
  }

  implicit private class MapOps[K, A, B, C, D](
      rows: Array[(K, A, B, C, D)]) {
    def toMap2: Map[K, (A, B, C, D)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }
}
