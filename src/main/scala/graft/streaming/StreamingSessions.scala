package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the continuous counterpart of
  * [[graft.ops.Sessionize.sessionSummary]].
  *
  * State per user is ONE open session (index, bounds, count, cents) in
  * the state store; a session closes — and is emitted — when a later
  * event for that user arrives more than `gapSeconds` after the
  * session's last event. Open sessions never emit (append-mode
  * semantics); callers that need end-of-stream closure feed one
  * far-future sentinel event per user, whose own session simply stays
  * open and unemitted.
  *
  * Determinism contract (what makes the driver gate hash-comparable
  * with the batch oracle): events must be fed in event-time order
  * ACROSS batches per user; within one batch the operator sorts the
  * group's rows by (es, event_id) itself, exactly the batch window
  * order. Value totals accumulate in fixed-point cents, so reduction
  * order cannot perturb them.
  */
object StreamingSessions {

  /** Open-session state carried between batches. */
  case class OpenSession(
      idx: Long, startUs: Long, lastUs: Long, n: Int, cents: Long)

  /** Closed-session output row — schema matches the batch
    * `sessionSummary` (user_id, session_idx, start_us, end_us,
    * n_events, value_cents, duration_s). */
  case class ClosedSession(
      user_id: Long, session_idx: Long, start_us: Long, end_us: Long,
      n_events: Int, value_cents: Long, duration_s: Long)

  /** Streaming point-in-time enrichment — the continuous counterpart
    * of [[graft.ops.Sessionize.asofJoin]]: one interleaved event
    * stream; rows of `sourceType` update per-key state (latest source
    * id/time), rows of `targetType` emit enriched with whatever the
    * state held AT-OR-BEFORE their timestamp. Within a batch the
    * group's rows sort by (es, src-before-target, event_id) — the
    * batch operator's inclusive-tie order — so feeding batches in
    * event-time order reproduces the batch as-of exactly. State per
    * key is ONE (id, es) pair.
    *
    * Input columns: user_id, event_id (long), ts (timestamp),
    * event_type (string). */
  def asofEnrichStream(
      stream: DataFrame,
      sourceType: String,
      targetType: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val prepared = stream.select(
      col("user_id").cast("long"),
      col("event_id").cast("long"),
      unix_micros(col("ts").cast("timestamp")).as("es"),
      col("event_type").cast("string"))
    val keyed = prepared.as[(Long, Long, Long, String)].groupByKey(_._1)
    keyed.flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout())(
      (user: Long, rows: Iterator[(Long, Long, Long, String)],
       state: GroupState[(Long, Long)]) => {
        val evs = rows.toArray.sortBy { case (_, id, es, t) =>
          (es, if (t == sourceType) 0 else 1, id)
        }
        var src = state.getOption.getOrElse((-1L, -1L))
        val out = Array.newBuilder[(Long, Long, Long, Long, Long)]
        evs.foreach { case (_, id, es, t) =>
          if (t == sourceType) src = (id, es)
          else if (t == targetType)
            out += ((id, user, es, src._1, src._2))
        }
        if (src._1 != -1L) state.update(src)
        out.result().iterator
      })
      .toDF("event_id", "user_id", "es", "src_id", "src_es")
  }

  /** Input columns required: user_id (long), event_id (long),
    * ts (timestamp), value (double). */
  def sessionizeStream(stream: DataFrame, gapSeconds: Long): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    val prepared = stream.select(
      col("user_id").cast("long"),
      col("event_id").cast("long"),
      unix_micros(col("ts").cast("timestamp")).as("es"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))

    val keyed = prepared
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)

    val out: Dataset[ClosedSession] = keyed.flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout())(
      (user: Long, rows: Iterator[(Long, Long, Long, Long)],
       state: GroupState[OpenSession]) => {
        // batch-local sort restores the batch window order (es, event_id)
        val evs = rows.toArray.sortBy(t => (t._3, t._2))
        var open = state.getOption.orNull
        val closed = Array.newBuilder[ClosedSession]
        evs.foreach { case (_, _, es, cents) =>
          if (open == null)
            open = OpenSession(1L, es, es, 1, cents)
          else if (es - open.lastUs > gapUs) {
            closed += ClosedSession(user, open.idx, open.startUs,
              open.lastUs, open.n, open.cents,
              (open.lastUs - open.startUs) / 1000000L)
            open = OpenSession(open.idx + 1, es, es, 1, cents)
          } else
            open = open.copy(lastUs = es, n = open.n + 1,
              cents = open.cents + cents)
        }
        if (open != null) state.update(open)
        closed.result().iterator
      })
    out.toDF()
  }
}
