package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class MrlSearchSpec extends SparkTestBase {
  import spark.implicits._

  private def e = Tables.embeddings(spark, sf("sf0.001"))

  private def queries(n: Int): Seq[(Long, Array[Float])] =
    e.orderBy(col("vec_id")).limit(n)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  private def asTriples(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def exact(qs: Seq[(Long, Array[Float])], k: Int, metric: String) =
    asTriples(VectorSearch.knnJoinExact(
      qs.map { case (id, v) => (id, v.toSeq) }.toDF("query_id", "qv"),
      "query_id", "qv", e, "vec_id", "embedding", k, metric))

  test("pool >= corpus makes truncated search EXACT at any prefix") {
    val n = e.count().toInt
    val qs = queries(4)
    val got = asTriples(MrlSearch.topKMany(
      e, "vec_id", "embedding", qs, k = 10, pool = n, m = 4))
    assert(got == exact(qs, 10, "l2sq"))
  }

  test("m == dim reproduces exact ranking at pool == k") {
    val qs = queries(4)
    val got = asTriples(MrlSearch.topKMany(
      e, "vec_id", "embedding", qs, k = 10, pool = 10, m = 64))
    assert(got == exact(qs, 10, "l2sq"))
  }

  test("cos metric: m == dim at pool == k matches exact cos top-k") {
    val qs = queries(3)
    val got = asTriples(MrlSearch.topKMany(
      e, "vec_id", "embedding", qs, k = 5, pool = 5, m = 64, metric = "cos"))
    assert(got == exact(qs, 5, "cos"))
  }

  test("plan: partial WindowGroupLimits, slice stays codegen, no UDF") {
    val qs = queries(3)
    val knn = MrlSearch.topKMany(
      e, "vec_id", "embedding", qs, k = 5, pool = 20, m = 16)
    val p = MaskedExplain.explain(knn, "formatted")
    assert(p.contains("WindowGroupLimit"), p.take(800))
    assert(!p.contains("GlobalSort"))
    val udfs = knn.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
    })
    assert(udfs.isEmpty)
  }

  test("prefix column is a slice: bytes scanned scale with m") {
    val rows = e.limit(5)
      .select(col("embedding"), MrlSearch.prefix(col("embedding"), 7))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Float](1) == r.getSeq[Float](0).take(7))
    }
  }
}
