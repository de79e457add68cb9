package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over an append-only event log: gap-based
  * sessionization, tumbling-window rollups and as-of (latest-prior)
  * attribution.
  *
  * These are the batch halves of the operators a training-data /
  * telemetry pipeline runs over clickstream-shaped data (the `events`
  * test table: event_id, ts, user_id, event_type, value, props). The
  * reference engine itself stays out of this space (it is a vector
  * extension), but the engine we are building is a general corpus
  * pipeline and event logs are a first-class input at 100 TB.
  *
  * Scale shape: every operator here makes exactly ONE hash Exchange on
  * `user_id` (or the window bucket) and then stays within that
  * partitioning — the lag window, the running session counter and the
  * per-session aggregate all declare `user_id`-prefixed keys, so
  * Catalyst satisfies the aggregate's ClusteredDistribution with the
  * window's existing HashPartitioning and no second shuffle appears.
  * Nothing collects on the driver; state per task is one window frame.
  */
object Sessionize {

  /** Microsecond event time — exact integer arithmetic in both Spark
    * (`unix_micros`) and the DuckDB oracle (`epoch_us`), no fractional
    * -second double drift. Parquet event logs read as TIMESTAMP_NTZ;
    * the cast maps wall-clock → instant in the session timezone, which
    * the engine pins to UTC, matching `epoch_us` on the naive value. */
  private def eventMicros(ts: Column): Column =
    unix_micros(ts.cast("timestamp"))

  /** Assign a per-user session index: a new session starts when the gap
    * to the user's previous event exceeds `gapSeconds`. Returns the
    * input rows plus `es` (event micros) and `session_idx` (1-based,
    * per user, in time order).
    *
    * Ties on `ts` break by `event_id` so the assignment is total and
    * deterministic under any partitioning.
    */
  def assignSessions(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("es", eventMicros(col("ts")))
      .withColumn("__prev", lag(col("es"), 1).over(w))
      .withColumn(
        "__new",
        when(col("__prev").isNull || col("es") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(w))
      .drop("__prev", "__new")
  }

  /** One row per session: bounds, event count, value sum.
    *
    * `sum_value` sums FIXED-POINT cents (`floor(value*100+0.5)` as
    * long) — long addition is associative, so the distributed reduction
    * order cannot perturb the result and the output hash-compares
    * against a single-threaded oracle replay. Emitting the raw double
    * sum would be order-sensitive in the last ulp.
    */
  def sessionSummary(events: DataFrame, gapSeconds: Long): DataFrame =
    assignSessions(events, gapSeconds)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("es")).as("start_us"),
        max(col("es")).as("end_us"),
        count(lit(1)).cast("int").as("n_events"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
      .withColumn("duration_s",
        ((col("end_us") - col("start_us")) / 1000000L).cast("long"))

  /** Tumbling-window rollup: events bucketed to `windowSeconds`-wide
    * windows per event_type, with an exact distinct-user count and the
    * max of an integer property pulled out of the JSON `props` column.
    *
    * The JSON pull uses `get_json_object` (codegen'd, Jackson-backed)
    * — the oracle replays it with DuckDB's `json_extract_string`. The
    * rollup is one partial-aggregated shuffle on (bucket, event_type);
    * `countDistinct(user_id)` expands to the standard two-phase
    * distinct aggregate — still a single Exchange of (bucket, type,
    * user) partials, no driver state.
    */
  def eventRollup(events: DataFrame, windowSeconds: Long): DataFrame = {
    val bucketUs = windowSeconds * 1000000L
    events
      .withColumn("__es", eventMicros(col("ts")))
      // Integer FLOOR division (pmod then exact `div`), not `/`: double
      // true-division truncates toward zero (pre-1970 micros bucket
      // off-by-one vs the oracle's `//`) and loses precision past 2^53.
      .withColumn("bucket",
        expr(s"(__es - pmod(__es, ${bucketUs}L)) div ${bucketUs}L"))
      .withColumn("k",
        get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("bucket"), col("event_type"))
      .agg(
        count(lit(1)).cast("int").as("n"),
        countDistinct(col("user_id")).cast("int").as("n_users"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"),
        max(col("k")).as("max_k"))
  }

  /** Rolling time-RANGE features: at every event, the count and value
    * total of the same user's events in the trailing `windowSeconds`
    * (inclusive of now) — the classic point-in-time feature columns
    * ("activity in the last 24 h") computed leak-free. A RANGE frame
    * over event micros, so simultaneous events all see each other
    * symmetrically regardless of sort ties; one user_id Exchange,
    * fixed-point cents (order-proof sums). */
  def rollingFeatures(events: DataFrame, windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("es"))
      .rangeBetween(-windowSeconds * 1000000L, 0L)
    events
      .withColumn("es", eventMicros(col("ts")))
      .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
      .select(col("event_id"), col("user_id"), col("es"),
        count(lit(1)).over(w).cast("int").as("n_window"),
        sum(col("cents")).over(w).as("cents_window"))
  }

  /** Generic point-in-time (as-of backward, inclusive) join — the
    * feature-store primitive: each left row picks the LATEST right row
    * with the same key and `rightTime ≤ leftTime` (what was known at
    * event time; joining on anything later leaks the future into
    * training features).
    *
    * No join operator at all: both sides union (zero shuffle), one
    * `key` window carries the last-seen right payload forward
    * (`last(…, ignoreNulls)`), left rows filter back out. At equal
    * timestamps the right row sorts FIRST, giving the inclusive ≤ —
    * DuckDB's native `ASOF JOIN (l.t >= r.t)` semantics, which the
    * driver gate uses as the oracle. The naive formulation is an
    * inequality join (quadratic per hot key); this is one sort inside
    * one hash Exchange on `key`.
    *
    * Right rows must be unique per (key, time) — pre-aggregate
    * duplicates (the gate keeps `max(id)`), or results depend on
    * intra-timestamp order. Right payload columns are carried to the
    * output; left columns pass through unchanged.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "graft: asofJoin needs payload columns")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__src", lit(1))
      .select(
        (Seq(col(keyCol), col(timeCol), col("__src")) ++
          leftCols.filterNot(c => c == keyCol || c == timeCol).map(col) ++
          payloadCols.map(c => lit(null).cast(
            right.schema(c).dataType).as(s"__r_$c"))): _*)
    val r = right
      .withColumn("__src", lit(0))
      .select(
        (Seq(col(keyCol), col(timeCol), col("__src")) ++
          leftCols.filterNot(c => c == keyCol || c == timeCol)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payloadCols.map(c => col(c).as(s"__r_$c"))): _*)
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"__asof_$c",
        last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried
      .where(col("__src") === 1)
      .select(
        (leftCols.map(col) ++
          payloadCols.map(c => col(s"__asof_$c").as(s"asof_$c"))): _*)
  }

  /** [[asofJoin]] with a MAX-STALENESS tolerance — the feature-store
    * freshness contract: a right-side value observed more than
    * `tolerance` time units before the left row's time must NOT leak
    * into features (a 3-week-old "latest price" is usually worse than
    * none). Matches staler than the tolerance come back as NULLs,
    * exactly as if no prior right row existed. Same single-Exchange
    * window shape as [[asofJoin]]; the right event time rides along as
    * one extra carried column. `timeCol` must be numeric (e.g. epoch
    * micros) so `left.time − right.time ≤ tolerance` is exact integer
    * arithmetic. */
  def asofJoinTolerance(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      payloadCols: Seq[String],
      tolerance: Long): DataFrame = {
    require(tolerance >= 0, s"graft: tolerance must be >= 0, got $tolerance")
    val tCol = "__asof_src_time"
    val out = asofJoin(left, right.withColumn(tCol, col(timeCol)),
      keyCol, timeCol, payloadCols :+ tCol)
    val fresh = col(s"asof_$tCol").isNotNull &&
      col(timeCol) - col(s"asof_$tCol") <= tolerance
    payloadCols.foldLeft(out) { (df, c) =>
      df.withColumn(s"asof_$c", when(fresh, col(s"asof_$c")))
    }.drop(s"asof_$tCol")
  }

  /** Strict-sequence funnel: per user, the time each step was FIRST
    * reached, where step i+1 only counts strictly after step i's
    * reach time. One groupBy(user_id) shuffle; the per-user event list
    * is folded by a higher-order `aggregate` over the sorted array —
    * no self-joins (the naive k-step formulation is k−1 inequality
    * joins). Per-task memory is one user's STEP-RELEVANT events only
    * (off-funnel events never enter the collected array), so a bot
    * user spamming non-step types costs nothing quadratic. Unreached
    * steps report -1; `reached` counts the contiguous prefix of
    * completed steps.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "graft: funnel needs at least one step")
    val k = steps.size
    val stepsLit = typedLit(steps)
    val zero = typedLit(Seq.fill(k)(-1L))
    // collect_list skips nulls, so the `when` guard keeps only
    // step-relevant events in the per-user array — a bot user with
    // millions of off-funnel events costs nothing here — while the
    // groupBy still emits a row for EVERY user with any event.
    val sorted = sort_array(collect_list(
      when(col("event_type").isin(steps: _*),
        struct(col("es"), col("event_id"), col("event_type")))))
    val folded = aggregate(sorted, zero, (acc, e) =>
      transform(acc, (v, i) => {
        // element_at is 1-based; the greatest() guard keeps the
        // (never-used) i=0 lookup in bounds under ANSI mode
        val prev = element_at(acc, greatest(i, lit(1)))
        when(v =!= -1L, v)
          .when(
            element_at(stepsLit, i + 1) === e.getField("event_type") &&
              (i === 0 || (prev =!= -1L && e.getField("es") > prev)),
            e.getField("es"))
          .otherwise(v)
      }))
    val base = events
      .withColumn("es", eventMicros(col("ts")))
      .groupBy(col("user_id"))
      .agg(folded.as("__t"))
    val stepCols = steps.zipWithIndex.map { case (s, i) =>
      element_at(col("__t"), i + 1).as(s"t_$s")
    }
    base.select(
      (col("user_id") +: stepCols :+
        (lit(k) - size(filter(col("__t"), v => v === -1L)))
          .cast("int").as("reached")): _*)
  }

  /** As-of attribution: for each event of `targetType`, the most recent
    * STRICTLY-PRIOR event of `sourceType` by the same user (classic
    * "which click led to this purchase"). No join anywhere — one
    * `user_id` window pass carries the last-seen source id/time via
    * `last(..., ignoreNulls)` over `rows between unbounded preceding
    * and 1 preceding`, then a filter keeps the targets. At 100 TB this
    * is the shape that survives: the naive formulation is an
    * inequality self-join (quadratic per hot user); the window form is
    * one sort within the single user_id Exchange.
    */
  def asofAttribution(
      events: DataFrame,
      sourceType: String,
      targetType: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("es", eventMicros(col("ts")))
      .withColumn("src_id",
        last(when(col("event_type") === sourceType, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("src_es",
        last(when(col("event_type") === sourceType, col("es")), ignoreNulls = true).over(w))
      .where(col("event_type") === targetType)
      // unattributed targets surface as -1, not NULL — a total output
      // hash-compares stably everywhere (NaN/NULL equality is
      // comparator-defined)
      .select(
        col("event_id"), col("user_id"), col("es"),
        coalesce(col("src_id"), lit(-1L)).as("src_id"),
        coalesce(col("src_es"), lit(-1L)).as("src_es"),
        coalesce(((col("es") - col("src_es")) / 1000000L).cast("long"),
          lit(-1L)).as("lag_s"))
  }
}
