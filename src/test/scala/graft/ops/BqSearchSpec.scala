package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class BqSearchSpec extends SparkTestBase {
  import spark.implicits._

  private def e = Tables.embeddings(spark, sf("sf0.001"))

  private def queries(n: Int): Seq[(Long, Array[Float])] =
    e.orderBy(col("vec_id")).limit(n)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  private def asTriples(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("pool >= corpus makes BQ rescore EXACT (any signature quality)") {
    val n = e.count().toInt
    val qs = queries(5)
    val got = asTriples(BqSearch.topKMany(
      e, "vec_id", "embedding", qs, k = 10, pool = n))
    val exact = asTriples(VectorSearch.knnJoinExact(
      qs.map { case (id, v) => (id, v.toSeq) }.toDF("query_id", "qv"),
      "query_id", "qv", e, "vec_id", "embedding", 10, "l2sq"))
    assert(got == exact)
  }

  test("prepacked path == inline path (same center)") {
    val qs = queries(5)
    val center = BqSearch.fitCenter(e, "embedding")
    val bits = e.select(col("vec_id"),
      BqSearch.pack(col("embedding"), center).as("bits"))
    val inline = asTriples(BqSearch.topKMany(
      e, "vec_id", "embedding", qs, k = 5, pool = 30, center = center))
    val pre = asTriples(BqSearch.topKManyPrepacked(
      bits, "vec_id", "bits", e, "embedding", qs, k = 5, pool = 30,
      center = center))
    assert(pre == inline)
  }

  test("pack column == packQuery driver packing, centered and raw") {
    val center = BqSearch.fitCenter(e, "embedding")
    for (c <- Seq(null, center)) {
      val rows = e.limit(20)
        .select(col("embedding"), BqSearch.pack(col("embedding"), c))
        .collect()
      rows.foreach { r =>
        val v = r.getSeq[Float](0).toArray
        assert(r.getSeq[Int](1) == BqSearch.packQuery(v, c).toSeq)
      }
    }
  }

  test("centering invariance: corpus shifted by a constant ranks identically") {
    val shift = 7.5f
    val shifted = e.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(shift)).as("embedding"))
    val qs = queries(3)
    val qsShift = qs.map { case (id, v) => (id, v.map(_ + shift)) }
    val c0 = BqSearch.fitCenter(e, "embedding")
    val c1 = BqSearch.fitCenter(shifted, "embedding")
    // the fitted center absorbs the shift ...
    c0.indices.foreach(i => assert(math.abs(c1(i) - c0(i) - shift) < 1e-3f))
    // ... so neighbor sets are unchanged (l2sq is shift-invariant too)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = ids(BqSearch.topKMany(e, "vec_id", "embedding", qs,
      k = 5, pool = 20, center = c0))
    val b = ids(BqSearch.topKMany(shifted, "vec_id", "embedding", qsShift,
      k = 5, pool = 20, center = c1))
    assert(a == b)
  }

  test("stage 1 plans codegen hamming_dist + WindowGroupLimit, no UDF") {
    val qs = queries(3)
    val knn = BqSearch.topKMany(e, "vec_id", "embedding", qs, k = 5, pool = 20)
    val p = MaskedExplain.explain(knn, "formatted")
    assert(p.contains("hamming_dist"), p.take(800))
    assert(p.contains("WindowGroupLimit"), p.take(800))
    val udfs = knn.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
    })
    assert(udfs.isEmpty)
  }

  test("BqIndex consolidate: compacts append files, applies tombstones") {
    import graft.ann.BqIndex
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet").limit(60)
    val dir = java.nio.file.Files.createTempDirectory("graft-bqcons").toString
    BqIndex.build(e.where($"vec_id" < 30), "vec_id", "embedding", dir)
    BqIndex.append(e.where($"vec_id" >= 30), "vec_id", "embedding", dir)
    assert(BqIndex.fileCount(spark, dir) >= 2)
    BqIndex.delete(spark, dir, Seq(5L))
    val q = e.where($"vec_id" === 7).select("embedding")
      .head().getSeq[Float](0).toArray
    val before = BqIndex.candidateIds(spark, dir, q, 20).toSeq
    assert(!before.contains(5L) && before.nonEmpty)
    BqIndex.consolidate(spark, dir)
    assert(BqIndex.fileCount(spark, dir) == 1)
    assert(BqIndex.bits(spark, dir).where($"id" === 5L).count() == 0)
    assert(!new java.io.File(s"$dir/tombstones").exists())
    // identical candidates after compaction (same bits, same center)
    assert(BqIndex.candidateIds(spark, dir, q, 20).toSeq == before)
  }

  test("cos rescore metric: dist column is the true cos_dist") {
    val qs = queries(2)
    val got = BqSearch.topKMany(
      e, "vec_id", "embedding", qs, k = 3, pool = 30, metric = "cos")
    val qDf = qs.map { case (id, v) => (id, v.toSeq) }.toDF("query_id", "qv")
    assert(graft.queries.RecallProtocol.distsTrue(
      got, qDf, e, "vec_id", "embedding", metric = "cos"))
  }
}
