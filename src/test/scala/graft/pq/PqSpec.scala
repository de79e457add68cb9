package graft.pq

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.l2sq_dist

class PqSpec extends SparkTestBase {

  private val fixed = PqCodebook(4, Array(
    Array(Array(0f, 0f), Array(1f, 1f)),
    Array(Array(0f, 0f), Array(-1f, -1f))))

  test("fixed codebook quantize/dequantize golden values") {
    assert(fixed.quantize(Array(0.9f, 0.8f, -0.9f, -1.1f)).toSeq === Seq(1.toShort, 1.toShort))
    assert(fixed.quantize(Array(0.1f, 0.2f, 0.1f, 0.1f)).toSeq === Seq(0.toShort, 0.toShort))
    assert(fixed.dequantize(Array(1.toShort, 0.toShort)).toSeq === Seq(1f, 1f, 0f, 0f))
    // ties pick the lowest centroid id
    assert(fixed.quantize(Array(0.5f, 0.5f, -0.5f, -0.5f)).toSeq === Seq(0.toShort, 0.toShort))
  }

  test("quantize validates dim; codebook validates divisibility and cluster count") {
    intercept[IllegalArgumentException] { fixed.quantize(Array(1f, 2f)) }
    intercept[IllegalArgumentException] { PqCodebook(5, fixed.centroids) }
    intercept[IllegalArgumentException] {
      ProductQuantizer.trainCodebook(
        Tables.embeddings(spark, sf("sf0.001")), "embedding", clusters = 257)
    }
  }

  test("asymmetric LUT distance equals l2sq against dequantized vector") {
    val q = Array(0.3f, -0.2f, 0.7f, 0.5f)
    val lut = fixed.l2sqLut(q)
    val codes = Array(1.toShort, 0.toShort)
    val lutDist = codes.indices.map(s => lut(s)(codes(s).toInt)).sum
    val deq = fixed.dequantize(codes)
    val direct = q.indices.map { i =>
      val d = q(i).toDouble - deq(i).toDouble; d * d
    }.sum
    assert(math.abs(lutDist - direct) < 1e-9)
  }

  test("codebook DF roundtrip preserves centroids") {
    val df = fixed.toDf(spark)
    val back = PqCodebook.fromDf(df, 4)
    assert(back.centroids.map(_.map(_.toSeq).toSeq).toSeq ===
      fixed.centroids.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("trained PQ recall@10 drop < 0.2 vs exact at 2000 vectors (hnsw_pq.sql:83-86 gate)") {
    // sf0.1 = 2,000 vectors: the scale where LUT-only top-k recall
    // decayed below the gate — the exact re-rank must hold it up
    val e = Tables.embeddings(spark, sf("sf0.1")).cache()
    val cb = ProductQuantizer.trainCodebook(
      e, "embedding", clusters = 64, subvectors = 32, seed = 7)
    val pq = ProductQuantizer.quantizeTable(e, "embedding", cb).cache()
    try {
      val queries = e.where(col("vec_id") < 5).select("vec_id", "embedding").collect()
      val recalls = queries.map { r =>
        val q = r.getSeq[Float](1).toArray
        val exact = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
          .orderBy(col("d"), col("vec_id")).limit(10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val approx = ProductQuantizer
          .searchPq(pq, "vec_id", "embedding_pq", cb, q, 10,
            rerankCol = Some("embedding"), ef = 100)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact.intersect(approx).size.toDouble / exact.size
      }
      val avg = recalls.sum / recalls.length
      assert(avg >= 0.8, s"avg PQ recall $avg (drop vs exact must be < 0.2)")
    } finally { pq.unpersist(); e.unpersist(); () }
  }

  test("searchPq without rerank still returns LUT top-k") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val pq = ProductQuantizer.quantizeTable(e, "embedding", fixed16())
    val q = Array.fill(64)(0.05f)
    val got = ProductQuantizer.searchPq(pq, "vec_id", "embedding_pq", fixed16(), q, 5)
      .collect()
    assert(got.length === 5)
    assert(got.map(_.getDouble(1)).toSeq === got.map(_.getDouble(1)).toSeq.sorted)
  }

  test("quantizeTable adds <col>_pq; dropQuantization removes it") {
    val e = Tables.embeddings(spark, sf("sf0.001")).limit(10)
    val pq = ProductQuantizer.quantizeTable(e, "embedding", fixed16())
    assert(pq.columns.contains("embedding_pq"))
    assert(ProductQuantizer.dropQuantization(pq, "embedding").columns.toSeq === e.columns.toSeq)
    val codes = pq.select("embedding_pq").head().getSeq[Short](0)
    assert(codes.length === 4)
  }

  /** Deterministic 64-dim codebook: 4 subvectors × 2 constant centroids. */
  private def fixed16(): PqCodebook = PqCodebook(64, Array.fill(4)(
    Array(Array.fill(16)(0f), Array.fill(16)(0.1f))))
}
