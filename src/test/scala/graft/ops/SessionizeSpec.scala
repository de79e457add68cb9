package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  // hand-built log: user 1 has two sessions split by a 2000 s gap;
  // user 2 has one session; ties on ts break by event_id
  private def log() = Seq(
    // (event_id, esSeconds, user, type, value)
    (1L, 0L, 1L, "click", 1.0),
    (2L, 100L, 1L, "view", 2.0),
    (3L, 100L, 1L, "purchase", 3.0), // same ts as 2 → ordered by id
    (4L, 2500L, 1L, "click", 4.0), // gap 2400 > 1800 → new session
    (5L, 2600L, 1L, "purchase", 0.5),
    (6L, 50L, 2L, "purchase", 7.0))
    .toDF("event_id", "es_s", "user_id", "event_type", "value")
    .withColumn("ts", timestamp_seconds(col("es_s")))
    .withColumn("props", lit("""{"k": 5}"""))

  test("sessionSummary: gap splits, tie order, fixed-point sums") {
    val out = Sessionize.sessionSummary(log(), gapSeconds = 1800)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "value_cents", "duration_s")
      .as[(Long, Long, Int, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, 3, 600L, 100L),
      (1L, 2L, 2, 450L, 100L),
      (2L, 1L, 1, 700L, 0L)))
  }

  test("sessionSummary plan: exactly one Exchange (agg reuses window partitioning)") {
    val plan = Sessionize.sessionSummary(log(), 1800)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("asofAttribution: strictly-prior source, per-user isolation") {
    val out = Sessionize.asofAttribution(log(), "click", "purchase")
      .orderBy("event_id")
      .select("event_id", "src_id", "lag_s")
      .as[(Long, Long, Long)].collect().toSeq
    // purchase 3 ← click 1 (lag 100 s); purchase 5 ← click 4 (lag 100 s);
    // purchase 6 (user 2) has no prior click → -1 sentinels
    assert(out === Seq(
      (3L, 1L, 100L),
      (5L, 4L, 100L),
      (6L, -1L, -1L)))
  }

  test("asofJoin: inclusive ties, no-prior nulls, payload carry, key isolation") {
    val quotes = Seq( // (user "key", time, payload)
      (1L, 10L, 100L), (1L, 20L, 200L), (1L, 30L, 300L),
      (2L, 15L, 999L))
      .toDF("user_id", "es", "quote_id")
    val trades = Seq(
      (1L, 1L, 5L), // before any quote → null
      (2L, 1L, 20L), // exact tie with quote at 20 → inclusive
      (3L, 1L, 25L), // between 20 and 30 → 200
      (4L, 2L, 50L), // key 2 sees only its own quote
      (5L, 3L, 50L)) // key 3 has no quotes at all → null
      .toDF("trade_id", "user_id", "es")
    val out = Sessionize.asofJoin(trades, quotes, "user_id", "es", Seq("quote_id"))
      .orderBy("trade_id")
      .select("trade_id", "asof_quote_id")
      .as[(Long, Option[Long])].collect().toSeq
    assert(out === Seq(
      (1L, None), (2L, Some(200L)), (3L, Some(200L)),
      (4L, Some(999L)), (5L, None)))
  }

  test("asofJoinTolerance: stale matches null out, fresh ones survive") {
    val purchases = Seq(
      (1L, 1L, 100L), // click at 95 → lag 5 ≤ 10: fresh
      (2L, 1L, 200L), // latest click at 95 → lag 105 > 10: stale
      (3L, 2L, 50L)) // no click at all
      .toDF("event_id", "user_id", "es")
    val clicks = Seq((1L, 95L, 7L)).toDF("user_id", "es", "click_id")
    val out = Sessionize.asofJoinTolerance(
        purchases, clicks, "user_id", "es", Seq("click_id"), tolerance = 10L)
      .orderBy("event_id")
      .select(col("event_id"), coalesce(col("asof_click_id"), lit(-1L)))
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 7L), (2L, -1L), (3L, -1L)))
    // zero tolerance keeps only exact-time matches (inclusive ties)
    val exact = Sessionize.asofJoinTolerance(
        Seq((9L, 1L, 95L)).toDF("event_id", "user_id", "es"),
        clicks, "user_id", "es", Seq("click_id"), tolerance = 0L)
      .select(coalesce(col("asof_click_id"), lit(-1L)))
      .as[Long].head()
    assert(exact == 7L)
  }

  test("funnel: strict ordering, partial prefixes, pre-step events ignored") {
    val evs = Seq(
      // user 1 completes signup→click→purchase, with a decoy click BEFORE signup
      (1L, 10L, 1L, "click", 0.0), // before signup — must not count
      (2L, 20L, 1L, "signup", 0.0),
      (3L, 30L, 1L, "click", 0.0),
      (4L, 40L, 1L, "purchase", 0.0),
      // user 2: signup only; purchase precedes click so never reached
      (5L, 10L, 2L, "signup", 0.0),
      (6L, 15L, 2L, "purchase", 0.0),
      (7L, 20L, 2L, "click", 0.0),
      // user 3: no funnel events at all
      (8L, 5L, 3L, "error", 0.0))
      .toDF("event_id", "es_s", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("es_s")))
    val out = Sessionize.funnel(evs, Seq("signup", "click", "purchase"))
      .orderBy("user_id")
      .select("user_id", "t_signup", "t_click", "t_purchase", "reached")
      .as[(Long, Long, Long, Long, Int)].collect().toSeq
    assert(out === Seq(
      (1L, 20000000L, 30000000L, 40000000L, 3),
      (2L, 10000000L, 20000000L, -1L, 2),
      (3L, -1L, -1L, -1L, 0)))
  }

  test("eventRollup: bucketing, distinct users, json prop max") {
    val out = Sessionize.eventRollup(log(), windowSeconds = 3600)
      .orderBy("bucket", "event_type")
      .select("bucket", "event_type", "n", "n_users", "value_cents", "max_k")
      .as[(Long, String, Int, Int, Long, Int)].collect().toSeq
    assert(out === Seq(
      (0L, "click", 2, 1, 500L, 5),
      (0L, "purchase", 3, 2, 1050L, 5),
      (0L, "view", 1, 1, 200L, 5)))
  }

  test("eventRollup: pre-1970 timestamps bucket by FLOOR, not truncation") {
    // es = -1 s → bucket floor(-1/3600) = -1; truncation-toward-zero
    // (double `/` then cast) would collapse it into bucket 0
    val evs = Seq((1L, -1L, 1L, "click", 1.0), (2L, 1L, 1L, "click", 1.0))
      .toDF("event_id", "es_s", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("es_s")))
      .withColumn("props", lit("{}"))
    val out = Sessionize.eventRollup(evs, windowSeconds = 3600)
      .orderBy("bucket").select("bucket", "n")
      .as[(Long, Int)].collect().toSeq
    assert(out === Seq((-1L, 1), (0L, 1)))
  }

  test("funnel: off-funnel event floods never enter the per-user array") {
    val steps = Seq("signup", "purchase")
    val base = Seq(
      (1L, 10L, 1L, "signup", 0.0),
      (2L, 20L, 1L, "purchase", 0.0))
    val flood = (3L to 500L).map(i => (i, 10L + i, 1L, "heartbeat", 0.0))
    val evs = (base ++ flood)
      .toDF("event_id", "es_s", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("es_s")))
    val out = Sessionize.funnel(evs, steps)
      .select("user_id", "t_signup", "t_purchase", "reached")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(out === Seq((1L, 10000000L, 20000000L, 2)))
    // the collected array is guarded by a CASE over event_type, so the
    // aggregate's state holds step events only
    val agg = Sessionize.funnel(evs, steps)
      .queryExecution.optimizedPlan.toString
    assert(agg.contains("CASE WHEN"), s"expected step guard in plan:\n$agg")
  }
}
