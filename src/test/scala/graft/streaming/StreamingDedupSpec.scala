package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class StreamingDedupSpec extends SparkTestBase {

  test("stateful streaming dedup keeps first doc per fingerprint across batches") {
    import spark.implicits._
    val mem = MemoryStream[(Long, String)](spark)
    val deduped = StreamingDedup.dropSeenDuplicates(
      mem.toDF().toDF("id", "text"), "text")

    val q = deduped.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma delta"))
      q.processAllAvailable()
      // duplicate inside the same batch dropped
      val b1 = spark.table("dedup_out").collect().map(_.getLong(0)).toSet
      assert(b1 === Set(1L, 3L))

      // duplicate across batches dropped via state; punctuation-only
      // variation is the SAME fingerprint (token-normalized)
      mem.addData((4L, "alpha, beta!"), (5L, "epsilon zeta"))
      q.processAllAvailable()
      val b2 = spark.table("dedup_out").collect().map(_.getLong(0)).toSet
      assert(b2 === Set(1L, 3L, 5L), s"got $b2")
    } finally q.stop()
  }

  test("watermarked windowed quality stats aggregate per event-time window") {
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String)](spark)
    val stats = StreamingDedup.qualityByWindow(
      mem.toDF().toDF("ts", "text"), "ts", "text",
      windowDuration = "1 minute", watermarkDelay = "1 minute")

    val q = stats.writeStream
      .format("memory").queryName("qwin_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 10:00:10")
      val t1 = Timestamp.valueOf("2026-01-01 10:00:40")
      val t2 = Timestamp.valueOf("2026-01-01 10:05:00") // advances watermark
      mem.addData((t0, "the quick brown fox"), (t1, "lazy dogs sleep here"),
        (t2, "much later doc"))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2026-01-01 10:09:00"), "flush"))
      q.processAllAvailable()

      val rows = spark.table("qwin_out").collect()
      val first = rows.find(_.getTimestamp(0) ===
        Timestamp.valueOf("2026-01-01 10:00:00"))
      assert(first.isDefined, s"rows: ${rows.mkString(";")}")
      assert(first.get.getLong(1) === 2L, "two docs in the 10:00 window")
      assert(first.get.getDouble(2) > 0.0)
    } finally q.stop()
  }
}
