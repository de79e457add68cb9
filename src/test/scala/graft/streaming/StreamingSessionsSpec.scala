package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.ops.Sessionize

class StreamingSessionsSpec extends SparkTestBase {
  import spark.implicits._

  test("stream/batch parity: chunked feed + sentinel flush matches batch sessions") {
    // deterministic synthetic log: 40 users, ~10 events each, gaps
    // engineered around the 300 s timeout
    val rnd = new scala.util.Random(7)
    val rows = (for {
      u <- 1L to 40L
      _ <- 1 to (3 + rnd.nextInt(8))
    } yield u).zipWithIndex.map { case (u, i) =>
      // per-user monotone-ish times with occasional big jumps
      val es = (i.toLong * 37 + rnd.nextInt(2000) * 1000L) * 1000L
      (u, i.toLong, es, rnd.nextInt(5000) / 100.0)
    }.sortBy(t => (t._3, t._2))

    val batchDf = rows.toDF("user_id", "event_id", "es_us", "value")
      .withColumn("ts", timestamp_micros(col("es_us")))
    val expected = Sessionize.sessionSummary(batchDf, gapSeconds = 300)
      .select("user_id", "session_idx", "start_us", "end_us",
        "n_events", "value_cents", "duration_s")
      .as[(Long, Long, Long, Long, Int, Long, Long)]
      .collect().toSeq.sorted

    val flushEs = rows.map(_._3).max + 1000000000L
    val sentinels = rows.map(_._1).distinct.map(u => (u, -1L, flushEs, 0.0))
    val mem = MemoryStream[(Long, Long, Long, Double)](spark)
    val src = mem.toDF().toDF("user_id", "event_id", "es_us", "value")
      .withColumn("ts", timestamp_micros(col("es_us")))
    val q = StreamingSessions.sessionizeStream(src, gapSeconds = 300)
      .writeStream.format("memory").queryName("ssess_spec")
      .outputMode(OutputMode.Append()).start()
    try {
      (rows.grouped(rows.length / 3 + 1).toSeq :+ sentinels).foreach { c =>
        mem.addData(c.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.table("ssess_spec")
      .select("user_id", "session_idx", "start_us", "end_us",
        "n_events", "value_cents", "duration_s")
      .as[(Long, Long, Long, Long, Int, Long, Long)]
      .collect().toSeq.sorted
    assert(got === expected)
  }

  test("asofEnrichStream: chunked stream matches batch as-of semantics") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map { i =>
      val u = 1L + rnd.nextInt(10)
      val t = if (rnd.nextBoolean()) "click" else "purchase"
      (u, i.toLong, (i.toLong * 1000 + rnd.nextInt(900)) * 1000L, t)
    }.sortBy { case (_, id, es, t) =>
      (es, if (t == "click") 0 else 1, id)
    }
    val batchDf = rows.toDF("user_id", "event_id", "es", "event_type")
    val expected = Sessionize.asofJoin(
      batchDf.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "es"),
      batchDf.where(col("event_type") === "click")
        .groupBy("user_id", "es").agg(max("event_id").as("src_id")),
      "user_id", "es", Seq("src_id"))
      .select(col("event_id"),
        coalesce(col("asof_src_id"), lit(-1L)).as("src_id"))
      .as[(Long, Long)].collect().toSeq.sorted

    val mem = MemoryStream[(Long, Long, Long, String)](spark)
    val src = mem.toDF().toDF("user_id", "event_id", "es_us", "event_type")
      .withColumn("ts", timestamp_micros(col("es_us")))
    val q = StreamingSessions.asofEnrichStream(src, "click", "purchase")
      .writeStream.format("memory").queryName("sasof_spec")
      .outputMode(OutputMode.Append()).start()
    try {
      rows.grouped(rows.size / 3 + 1).foreach { c =>
        mem.addData(c.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("sasof_spec")
      .select("event_id", "src_id")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got === expected)
  }

  test("open sessions do not emit until a later event closes them") {
    val mem = MemoryStream[(Long, Long, Long, Double)](spark)
    val src = mem.toDF().toDF("user_id", "event_id", "es_us", "value")
      .withColumn("ts", timestamp_micros(col("es_us")))
    val q = StreamingSessions.sessionizeStream(src, gapSeconds = 10)
      .writeStream.format("memory").queryName("ssess_open")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, 1L, 0L, 1.0), (1L, 2L, 5000000L, 1.0))
      q.processAllAvailable()
      assert(spark.table("ssess_open").count() === 0)
      // 11 s later → closes session 1 (2 events), opens session 2
      mem.addData((1L, 3L, 16000001L, 2.0))
      q.processAllAvailable()
      val s = spark.table("ssess_open")
        .select("session_idx", "n_events", "value_cents")
        .as[(Long, Int, Long)].collect().toSeq
      assert(s === Seq((1L, 2, 200L)))
    } finally q.stop()
  }
}
