package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.l2sq_dist

class ProjectedSearchSpec extends SparkTestBase {
  import spark.implicits._

  private def exactTop(df: org.apache.spark.sql.DataFrame, q: Array[Float], k: Int) =
    df.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
      .orderBy(col("d"), col("vec_id")).limit(k)
      .select(col("vec_id"), col("d")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("pool >= corpus makes projected search EXACT for any matrix") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val n = e.count().toInt
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val m = RandomProjection.sparse(64, 4, seed = 2L) // brutal 64→4
    val got = ProjectedSearch.topK(e, "vec_id", "embedding", m, null, q,
        k = 10, pool = n)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exactTop(e, q, 10))
  }

  test("identity projection reproduces exact ranking at pool == k") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val q = e.where(col("vec_id") === 1).select("embedding")
      .head().getSeq[Float](0).toArray
    val id64 = Array.tabulate(64, 64)((i, j) => if (i == j) 1.0 else 0.0)
    val got = ProjectedSearch.topK(e, "vec_id", "embedding", id64, null, q,
        k = 10, pool = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exactTop(e, q, 10))
  }

  test("both stages are TakeOrderedAndProject; kernel stays codegen") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val m = RandomProjection.gaussian(64, 16, seed = 4L)
    val knn = ProjectedSearch.topK(e, "vec_id", "embedding", m, null, q,
      k = 5, pool = 50)
    val p = MaskedExplain.explain(knn, "formatted")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("GlobalSort"))
    val udfs = knn.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
    })
    assert(udfs.isEmpty)
  }

  test("projectQuery folds bias; projectedDist equals manual distance") {
    val m = RandomProjection.gaussian(4, 2, seed = 6L)
    val bias = Array(0.5, -1.0)
    val q = Array(1.0f, 0.0f, 2.0f, -1.0f)
    val qp = ProjectedSearch.projectQuery(m, bias, q)
    val v = Array(0.5f, 1.5f, -0.5f, 2.0f)
    val got = Seq(Tuple1(v)).toDF("v")
      .select(ProjectedSearch.projectedDist(col("v"), m, bias, qp))
      .head().getDouble(0)
    def proj(x: Array[Float]) = m.map(row =>
      row.zip(x).map { case (a, b) => a * b.toDouble }.sum)
    val pv = proj(v).zip(bias).map { case (a, b) => a - b }
    val pq = proj(q).zip(bias).map { case (a, b) => a - b }
    val want = pv.zip(pq).map { case (a, b) => (a - b) * (a - b) }.sum
    assert(math.abs(got - want) < 1e-9, s"$got vs $want")
  }
}
