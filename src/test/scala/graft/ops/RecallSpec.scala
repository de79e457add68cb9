package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Recall]] — the distributed `calculate_table_recall` analog
  * (reference lantern_hnsw/test/sql/utils/calculate_recall.sql:1-48).
  * Hand-computed values, set semantics, the unanswered-query-scores-
  * zero rule, and the no-driver-loop plan shape. */
class RecallSpec extends SparkTestBase {
  import spark.implicits._

  private def df(rows: (Long, Long)*) =
    rows.toDF("query_id", "id")

  test("tableRecall: hand-computed mean over queries") {
    val truth = df(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 20L), (2L, 21L), (2L, 22L), (2L, 23L))
    // q1 hits 3/4, q2 hits 1/4 → mean 0.5
    val retrieved = df(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 99L),
      (2L, 20L), (2L, 98L), (2L, 97L), (2L, 96L))
    assert(Recall.tableRecall(retrieved, truth, 4) == 0.5)
  }

  test("identity: a result scored against itself is exactly 1.0") {
    val truth = df((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
    assert(Recall.tableRecall(truth, truth, 2) == 1.0)
  }

  test("unanswered query scores 0.0; extra retrieved-only query not scored") {
    val truth = df((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
    val retrieved = df((1L, 10L), (1L, 11L), (7L, 70L), (7L, 71L))
    // q1 = 1.0, q2 = 0.0 (silently unanswered), q7 has no truth row
    assert(Recall.tableRecall(retrieved, truth, 2) == 0.5)
    val per = Recall.perQueryRecall(retrieved, truth, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(per == Map(1L -> 1.0, 2L -> 0.0))
  }

  test("duplicates collapse before counting (set semantics)") {
    val truth = df((1L, 10L), (1L, 11L))
    val retrieved = df((1L, 10L), (1L, 10L), (1L, 10L))
    assert(Recall.tableRecall(retrieved, truth, 2) == 0.5)
  }

  test("custom column names") {
    val truth = Seq((1L, 10L)).toDF("q", "n")
    assert(Recall.tableRecall(truth, truth, 1, "q", "n") == 1.0)
  }

  test("plan: one declarative join+aggregate plan, no per-query driver loop") {
    val truth = df((1L, 10L), (2L, 20L))
    val plan = Recall.perQueryRecall(truth, truth, 1)
      .queryExecution.optimizedPlan
    // the whole measurement is joins + aggregates in ONE Catalyst plan
    // — the scale path (AQE may broadcast the exchanges away on tiny
    // inputs, so assert the logical shape, not physical shuffles)
    val s = plan.toString
    assert(s.contains("Aggregate") && s.contains("Join"), s)
  }
}
