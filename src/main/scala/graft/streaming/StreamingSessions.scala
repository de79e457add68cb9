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
