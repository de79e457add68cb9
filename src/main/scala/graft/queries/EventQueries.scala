package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Sessionize

/** Driver-checkable queries for the event-log analytics surface
  * (`ops/Sessionize`, `streaming/StreamingSessions`) over the `events`
  * table — gap sessionization, tumbling rollups, as-of attribution,
  * and the streaming sessionizer gated against the batch oracle.
  *
  * All time arithmetic is integer microseconds (`unix_micros` /
  * `epoch_us`) and all value sums are fixed-point cents, so every
  * query hash-compares exactly. Plans: one hash Exchange each
  * (user_id for the window family, the group key for the rollup);
  * the session aggregate reuses the window's partitioning because
  * its key is user_id-prefixed.
  */
object EventQueries {

  private val GapSeconds = 1800L

  private def sessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessionSummary(Tables.events(s, dir), GapSeconds)
      .select("user_id", "session_idx", "start_us", "end_us",
        "n_events", "value_cents", "duration_s")
      .orderBy("user_id", "session_idx")

  private val sessionizeOracle =
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS es, value FROM events
       |), x AS (
       |  SELECT *, CASE WHEN lag(es) OVER w IS NULL
       |    OR es - lag(es) OVER w > ${GapSeconds * 1000000L} THEN 1 ELSE 0 END AS new_s
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
       |), y AS (
       |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY es, event_id
       |    ROWS UNBOUNDED PRECEDING) AS session_idx FROM x
       |)
       |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       |  min(es) AS start_us, max(es) AS end_us,
       |  CAST(count(*) AS INT) AS n_events,
       |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
       |  CAST((max(es) - min(es)) // 1000000 AS BIGINT) AS duration_s
       |FROM y GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  private def eventRollup(s: SparkSession, dir: String): DataFrame =
    Sessionize.eventRollup(Tables.events(s, dir), windowSeconds = 3600L)
      .orderBy("bucket", "event_type")

  private val eventRollupOracle =
    """SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS bucket, event_type,
      |  CAST(count(*) AS INT) AS n,
      |  CAST(count(DISTINCT user_id) AS INT) AS n_users,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
      |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      |FROM events GROUP BY bucket, event_type
      |ORDER BY bucket, event_type""".stripMargin

  private def asofAttribution(s: SparkSession, dir: String): DataFrame =
    Sessionize.asofAttribution(Tables.events(s, dir), "click", "purchase")
      .orderBy("event_id")

  private val asofOracle =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS es FROM events
      |), x AS (
      |  SELECT *,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |      OVER w AS src_id,
      |    last_value(CASE WHEN event_type = 'click' THEN es END IGNORE NULLS)
      |      OVER w AS src_es
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |)
      |SELECT event_id, user_id, es,
      |  coalesce(src_id, -1) AS src_id, coalesce(src_es, -1) AS src_es,
      |  coalesce(CAST((es - src_es) // 1000000 AS BIGINT), -1) AS lag_s
      |FROM x WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  private def rollingFeatures(s: SparkSession, dir: String): DataFrame =
    Sessionize.rollingFeatures(Tables.events(s, dir), windowSeconds = 86400L)
      .orderBy("event_id")

  private val rollingOracle =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS es,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |)
      |SELECT event_id, user_id, es,
      |  CAST(count(*) OVER w AS INT) AS n_window,
      |  CAST(sum(cents) OVER w AS BIGINT) AS cents_window
      |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es
      |  RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Generic as-of join gated against DuckDB's NATIVE `ASOF LEFT
    * JOIN` — purchases pick the latest click known at purchase time.
    * Clicks pre-aggregate to unique (user, time) as the operator's
    * contract requires. */
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("es", unix_micros(col("ts").cast("timestamp")))
    val clicks = e.where(col("event_type") === "click")
      .groupBy("user_id", "es").agg(max("event_id").as("click_id"))
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "es")
    Sessionize.asofJoin(purchases, clicks, "user_id", "es", Seq("click_id"))
      .select(col("event_id"), col("user_id"), col("es"),
        coalesce(col("asof_click_id"), lit(-1L)).as("click_id"))
      .orderBy("event_id")
  }

  private val asofJoinOracle =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS es FROM events
      |), c0 AS (
      |  SELECT user_id, es, max(event_id) AS click_id FROM e
      |  WHERE event_type = 'click' GROUP BY user_id, es
      |), p AS (
      |  SELECT event_id, user_id, es FROM e WHERE event_type = 'purchase'
      |)
      |SELECT p.event_id, p.user_id, p.es,
      |  coalesce(c.click_id, -1) AS click_id
      |FROM p ASOF LEFT JOIN c0 c
      |  ON p.user_id = c.user_id AND p.es >= c.es
      |ORDER BY p.event_id""".stripMargin

  /** As-of join with a 1-hour max-staleness tolerance: a click more
    * than an hour before the purchase must NOT attribute (feature
    * freshness). Oracle = DuckDB's native ASOF LEFT JOIN with the
    * stale matches CASEd back to the no-match sentinel. */
  private def asofTolerance(s: SparkSession, dir: String): DataFrame = {
    val tolUs = 3600L * 1000000L
    val e = Tables.events(s, dir)
      .withColumn("es", unix_micros(col("ts").cast("timestamp")))
    val clicks = e.where(col("event_type") === "click")
      .groupBy("user_id", "es").agg(max("event_id").as("click_id"))
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "es")
    Sessionize.asofJoinTolerance(
        purchases, clicks, "user_id", "es", Seq("click_id"), tolUs)
      .select(col("event_id"), col("user_id"), col("es"),
        coalesce(col("asof_click_id"), lit(-1L)).as("click_id"))
      .orderBy("event_id")
  }

  private val asofToleranceOracle =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS es FROM events
      |), c0 AS (
      |  SELECT user_id, es, max(event_id) AS click_id FROM e
      |  WHERE event_type = 'click' GROUP BY user_id, es
      |), p AS (
      |  SELECT event_id, user_id, es FROM e WHERE event_type = 'purchase'
      |)
      |SELECT p.event_id, p.user_id, p.es,
      |  CASE WHEN c.es IS NOT NULL AND p.es - c.es <= 3600000000
      |       THEN c.click_id ELSE -1 END AS click_id
      |FROM p ASOF LEFT JOIN c0 c
      |  ON p.user_id = c.user_id AND p.es >= c.es
      |ORDER BY p.event_id""".stripMargin

  private def funnel(s: SparkSession, dir: String): DataFrame =
    Sessionize.funnel(Tables.events(s, dir),
      Seq("signup", "click", "purchase"))
      .orderBy("user_id")

  private val funnelOracle =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS es FROM events
      |), f1 AS (
      |  SELECT user_id, min(es) AS t1 FROM e
      |  WHERE event_type = 'signup' GROUP BY user_id
      |), f2 AS (
      |  SELECT e.user_id, min(es) AS t2 FROM e JOIN f1 USING (user_id)
      |  WHERE event_type = 'click' AND es > f1.t1 GROUP BY e.user_id
      |), f3 AS (
      |  SELECT e.user_id, min(es) AS t3 FROM e JOIN f2 USING (user_id)
      |  WHERE event_type = 'purchase' AND es > f2.t2 GROUP BY e.user_id
      |), u AS (SELECT DISTINCT user_id FROM e)
      |SELECT u.user_id,
      |  coalesce(t1, -1) AS t_signup,
      |  coalesce(t2, -1) AS t_click,
      |  coalesce(t3, -1) AS t_purchase,
      |  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
      |    WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS reached
      |FROM u LEFT JOIN f1 USING (user_id) LEFT JOIN f2 USING (user_id)
      |  LEFT JOIN f3 USING (user_id)
      |ORDER BY u.user_id""".stripMargin

  /** Funnel conversion summary: users per reached level and the median
    * signup→purchase latency among full conversions (NULL-ignoring
    * percentile → -1 for partial levels). */
  private def funnelRates(s: SparkSession, dir: String): DataFrame =
    Sessionize.funnel(Tables.events(s, dir),
      Seq("signup", "click", "purchase"))
      .withColumn("conv_s",
        when(col("reached") === 3,
          ((col("t_purchase") - col("t_signup")) / 1000000L).cast("long")))
      .groupBy(col("reached"))
      .agg(count(lit(1)).cast("int").as("n_users"),
        coalesce(round(percentile(col("conv_s"), lit(0.5)), 4), lit(-1.0))
          .as("median_conv_s"))
      .orderBy("reached")

  private lazy val funnelRatesOracle =
    s"""WITH f AS ($funnelOracle)
       |SELECT reached, CAST(count(*) AS INT) AS n_users,
       |  coalesce(round(quantile_cont(CASE WHEN reached = 3
       |    THEN (t_purchase - t_signup) // 1000000 END, 0.5), 4), -1.0)
       |    AS median_conv_s
       |FROM f GROUP BY reached ORDER BY reached""".stripMargin

  /** Event-time-range chunk files of an events projection — the shared
    * FILE-source feed of the event streaming gates (no driver
    * materialization of the stream input; only the min/max(es)
    * aggregate reaches the driver). `extra` appends trailing chunks
    * (sentinels/flushes — pure functions of the dataset). */
  private def eventChunks(
      s: SparkSession, dir: String, tag: String, base: DataFrame,
      extra: Seq[(Long, Long) => DataFrame] = Nil): Seq[java.io.File] = {
    import s.implicits._
    val (minEs, maxEs) = base.agg(min("es_us"), max("es_us"))
      .as[(Long, Long)].head()
    val width = (maxEs - minEs) / 4 + 1
    val chunkRoot = AnnQueries.artifactDir(tag, dir, "events")
    StreamChunks.materialize(chunkRoot,
      (0 until 4).map { c => () =>
        base.where(col("es_us") >= minEs + c * width &&
          col("es_us") < minEs + (c + 1) * width)
      } ++ extra.map(mk => () => mk(minEs, maxEs)))
  }

  /** Streaming sessionizer fed the whole events table through the FILE
    * source as 4 event-time-range parquet chunk files (`readStream` +
    * `maxFilesPerTrigger 1`) + a sentinel chunk (one far-future event
    * per user, closing every real session; the sentinels' own sessions
    * stay open and never emit). Result must hash-match the BATCH
    * sessionize oracle — the stream/batch parity gate. */
  private def streamingSessions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val base = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("es_us"), col("value"))
    val files = eventChunks(s, dir, "ssess", base, extra = Seq(
      (_, maxEs) => base.select(col("user_id")).distinct()
        .select(col("user_id"), lit(-1L).as("event_id"),
          lit(maxEs + GapSeconds * 2000000L).as("es_us"),
          lit(0.0).as("value"))))
    val (streamDir, rawSrc) = StreamChunks.source(s, base.schema)
    val src = rawSrc.withColumn("ts", timestamp_micros(col("es_us")))
    val sessions = graft.streaming.StreamingSessions
      .sessionizeStream(src, GapSeconds)
    val sink = "graft_ssess_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // state partitions pinned low — see withShufflePartitions scaladoc
    withShufflePartitions(s, 8) {
      val q = sessions.writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      StreamChunks.drive(q, streamDir, files)
    }
    s.table(sink)
      .select("user_id", "session_idx", "start_us", "end_us",
        "n_events", "value_cents", "duration_s")
      .orderBy("user_id", "session_idx")
  }

  /** Watermarked tumbling-window rollup over REAL event times, fed
    * through the FILE source — the production shape: events stream in
    * as 4 event-time-range parquet files via `readStream` +
    * `maxFilesPerTrigger 1` (NO driver materialization of the stream
    * input; only min/max(es) aggregates reach the driver), through
    * `withWatermark("2 hours") → groupBy(window("1 hour"), type)` in
    * APPEND mode — a window only emits once the watermark passes it
    * (two far-future flush files close the tail; their own windows
    * sit past the cutoff and are filtered). DISTINCT aggregates are
    * unsupported in streaming, so this is the batch `event_rollup`
    * minus `n_users`; everything else must hash-match the batch
    * replay. */
  private def streamingRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val base = Tables.events(s, dir)
      .select(unix_micros(col("ts").cast("timestamp")).as("es"),
        col("event_type"), col("value"), col("props"))
    val (minEs, maxEs) = base.agg(min(col("es")), max(col("es")))
      .as[(Long, Long)].head()
    val cutoff = maxEs / 3600000000L * 3600
    val width = (maxEs - minEs) / 4 + 1
    // chunk files are a pure function of the events table — build once
    // per dataset (fingerprinted dir), then each run feeds fresh COPIES
    // into its own source dir (file-source offsets don't reuse)
    val chunkRoot = AnnQueries.artifactDir("srol2", dir, "events")
    val chunkFiles = StreamChunks.materialize(chunkRoot,
      (0 until 4).map { c => () =>
        base.where(col("es") >= minEs + c * width &&
          col("es") < minEs + (c + 1) * width)
      } ++ Seq(14400000000L, 18000000000L).map { off => () =>
        Seq((maxEs + off, "flush", 0.0, "{}"))
          .toDF("es", "event_type", "value", "props")
      })
    val (streamDir, src) = StreamChunks.source(s, base.schema)
    val agg = src
      .withColumn("ts", timestamp_micros(col("es")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).cast("int").as("n"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"),
        max(get_json_object(col("props"), "$.k").cast("int")).as("max_k"))
    val sink = "graft_srol_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    withShufflePartitions(s, 8) {
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      // one time-contiguous chunk file per trigger: watermark advances
      // monotonically across batches, exactly like a tailed event log
      StreamChunks.drive(q, streamDir, chunkFiles)
    }
    s.table(sink)
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("value_cents"), col("max_k"))
      .where(col("window_start") <= cutoff)
      .orderBy("window_start", "event_type")
  }

  private val streamingRollupOracle =
    """SELECT CAST(epoch_us(ts) // 3600000000 * 3600 AS BIGINT) AS window_start,
      |  event_type,
      |  CAST(count(*) AS INT) AS n,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
      |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      |FROM events GROUP BY window_start, event_type
      |ORDER BY window_start, event_type""".stripMargin

  /** Star-schema enrichment rollup: events → customer → nation →
    * region, grouped by region and event type. The dimension chain is
    * broadcast end-to-end (dims are small by definition), so the fact
    * scan joins map-side and the ONLY shuffle is the final rollup —
    * the plan every 100 TB fact-table enrichment should have. */
  private def regionRollup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val dim = broadcast(
      Tables.read(s, dir, "customer")
        .join(Tables.read(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .join(Tables.read(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("r_name")))
    e.join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("r_name"), col("event_type"))
      .agg(
        count(lit(1)).cast("int").as("n"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
      .orderBy("r_name", "event_type")
  }

  private val regionRollupOracle =
    """SELECT r.r_name, e.event_type,
      |  CAST(count(*) AS INT) AS n,
      |  CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS value_cents
      |FROM events e
      |JOIN customer c ON e.user_id = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name, e.event_type
      |ORDER BY r.r_name, e.event_type""".stripMargin

  /** Streaming point-in-time enrichment fed the interleaved event
    * stream through the FILE source as event-time-range chunk files
    * (`readStream` + `maxFilesPerTrigger 1`): purchases emit with the
    * latest click known at-or-before their timestamp, held as one
    * (id, es) pair per user in the state store. Must hash-match
    * DuckDB's native ASOF LEFT JOIN — the same external oracle as the
    * batch `asof_join`, so batch and stream are pinned to identical
    * semantics. */
  private def streamingAsof(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val base = Tables.events(s, dir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("es_us"),
        col("event_type"))
    val files = eventChunks(s, dir, "sasof", base)
    val (streamDir, rawSrc) = StreamChunks.source(s, base.schema)
    val src = rawSrc.withColumn("ts", timestamp_micros(col("es_us")))
    val enriched = graft.streaming.StreamingSessions
      .asofEnrichStream(src, "click", "purchase")
    val sink = "graft_sasof_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    withShufflePartitions(s, 8) {
      val q = enriched.writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      StreamChunks.drive(q, streamDir, files)
    }
    s.table(sink)
      .select("event_id", "user_id", "es", "src_id", "src_es")
      .orderBy("event_id")
  }

  private val streamingAsofOracle =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS es FROM events
      |), c0 AS (
      |  SELECT user_id, es, max(event_id) AS click_id FROM e
      |  WHERE event_type = 'click' GROUP BY user_id, es
      |), p AS (
      |  SELECT event_id, user_id, es FROM e WHERE event_type = 'purchase'
      |)
      |SELECT p.event_id, p.user_id, p.es,
      |  coalesce(c.click_id, -1) AS src_id,
      |  coalesce(c.es, -1) AS src_es
      |FROM p ASOF LEFT JOIN c0 c
      |  ON p.user_id = c.user_id AND p.es >= c.es
      |ORDER BY p.event_id""".stripMargin

  /** Per-type value outliers (3σ rule). Moments accumulate as EXACT
    * integer sums of cents and squared cents; the combination
    * `n*s2 - s1²` runs in decimal(38,0) — exact to 1e38, matching
    * DuckDB's HUGEINT promotion of sum(BIGINT) — because s1² overflows
    * long silently once total cents pass ~3e9 (≈$30M, easily reached
    * at scale). Both engines then convert the same exact integer to
    * double, so the float-reduction-order trap that makes naive stddev
    * comparisons flap is structurally absent. One broadcast of the
    * per-type moments row back to the scan. */
  private def valueOutliers(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
    val dec = "decimal(38,0)"
    // s2 squares AND accumulates in decimal: the per-row long square
    // wraps silently past |cents| ≈ 3e9 (one $30M event), and a long
    // sum overflows at ~1e9 events of $1000 each. s1 stays long
    // (overflow needs ~9e13 such events per type) — cheaper partials
    // on the hot sum.
    val stats = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s1"),
        sum(col("cents").cast(dec) * col("cents").cast(dec)).as("s2"))
      .select(col("event_type"),
        (col("s1").cast("double") / col("n")).as("mean_c"),
        sqrt((col("n").cast(dec) * col("s2")
          - col("s1").cast(dec) * col("s1").cast(dec)).cast("double")
          / col("n") / col("n")).as("sd_c"))
    e.join(broadcast(stats), "event_type")
      .where(col("cents").cast("double") > col("mean_c") + col("sd_c") * 3.0)
      .select(col("event_id"), col("event_type"), col("cents"))
      .orderBy("event_id")
  }

  private val valueOutliersOracle =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |), st AS (
      |  SELECT event_type,
      |    sum(cents) * 1.0 / count(*) AS mean_c,
      |    sqrt((count(*) * sum(cents * cents) - sum(cents) * sum(cents)) * 1.0
      |      / count(*) / count(*)) AS sd_c
      |  FROM e GROUP BY event_type
      |)
      |SELECT e.event_id, e.event_type, e.cents
      |FROM e JOIN st USING (event_type)
      |WHERE e.cents * 1.0 > st.mean_c + 3.0 * st.sd_c
      |ORDER BY e.event_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("sessionize", Some(sessionizeOracle), sessionize),
    QueryDef("event_rollup", Some(eventRollupOracle), eventRollup),
    QueryDef("asof_attribution", Some(asofOracle), asofAttribution),
    QueryDef("funnel", Some(funnelOracle), funnel),
    QueryDef("funnel_rates", Some(funnelRatesOracle), funnelRates),
    QueryDef("asof_join", Some(asofJoinOracle), asofJoin),
    QueryDef("asof_tolerance", Some(asofToleranceOracle), asofTolerance),
    QueryDef("rolling_features", Some(rollingOracle), rollingFeatures),
    QueryDef("streaming_asof", Some(streamingAsofOracle), streamingAsof),
    QueryDef("streaming_sessions", Some(sessionizeOracle), streamingSessions),
    QueryDef("streaming_rollup", Some(streamingRollupOracle), streamingRollup),
    QueryDef("region_rollup", Some(regionRollupOracle), regionRollup),
    QueryDef("value_outliers", Some(valueOutliersOracle), valueOutliers))
}
