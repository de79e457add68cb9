package graft.ann

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.l2sq_dist
import graft.pq.ProductQuantizer

class PqAnnSpec extends SparkTestBase {

  test("PQ index: recall within 0.1 of dequantized exact, artifact much smaller (hnsw_pq_index.sql gate)") {
    val e = Tables.embeddings(spark, sf("sf0.001")).cache()
    val deqDf = {
      val cb0 = ProductQuantizer.trainCodebook(
        e, "embedding", clusters = 64, subvectors = 32, seed = 7)
      e.withColumn("deq", ProductQuantizer.dequantizeUdf(cb0)(
        ProductQuantizer.quantizeUdf(cb0)(col("embedding")))).cache()
    }
    try {
      val cb = ProductQuantizer.trainCodebook(
        e, "embedding", clusters = 64, subvectors = 32, seed = 7)
      val tmp = Files.createTempDirectory("graft-pqann").toString
      val pqPath = s"$tmp/pq-idx"
      val floatPath = s"$tmp/float-idx"

      PqAnnIndex.build(e, "vec_id", "embedding", pqPath, cb,
        AnnParams(m = 16, efConstruction = 128, numPartitions = 2))
      AnnIndex.build(e, "vec_id", "embedding", floatPath,
        AnnParams(m = 16, efConstruction = 128, numPartitions = 2))

      // codes are 32 B/vector vs 256 B of floats; topology and the
      // per-shard codebook are shared overhead, so assert a solid
      // reduction rather than the asymptotic dim*4/subvectors ratio
      def dirSize(p: String): Long = {
        val d = new java.io.File(s"$p/graphs")
        d.listFiles().map(_.length()).sum
      }
      assert(dirSize(pqPath) < (dirSize(floatPath) * 0.65).toLong,
        s"pq=${dirSize(pqPath)} float=${dirSize(floatPath)}")

      val queries = e.where(col("vec_id") < 5).select("vec_id", "embedding").collect()
      val (rPq, rDeq) = queries.map { row =>
        val q = row.getSeq[Float](1).toArray
        val exactTruth = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
          .orderBy(col("d"), col("vec_id")).limit(10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        // exact search over the dequantized column — the reference's
        // comparison baseline (recall of PQ data without the index)
        val deqTruth = deqDf.withColumn("d", l2sq_dist(col("deq"), lit(q)))
          .orderBy(col("d"), col("vec_id")).limit(10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val pqGot = PqAnnIndex.search(spark, pqPath, q, 10, ef = 64)
          .map(_._1).toSet
        (pqGot.intersect(exactTruth).size / 10.0,
          deqTruth.intersect(exactTruth).size / 10.0)
      }.unzip

      val pqRecall = rPq.sum / rPq.length
      val deqRecall = rDeq.sum / rDeq.length
      // index adds at most 0.1 recall drop on top of quantization
      // (hnsw_pq_index.sql:120-129)
      assert(deqRecall - pqRecall <= 0.1 + 1e-9,
        s"pq-index recall $pqRecall vs dequantized-exact recall $deqRecall")
      assert(pqRecall >= 0.6, s"pqRecall=$pqRecall deqRecall=$deqRecall")
    } finally {
      // unpersist in finally: a leaked cache entry would swap
      // LogicalRelation for InMemoryRelation in later suites and mask
      // the planner-rule tests
      deqDf.unpersist(); e.unpersist(); ()
    }
  }

  test("PQ index roundtrips topology: same ids, LUT distance sane") {
    import spark.implicits._
    val df = (0L until 100L).map(i =>
      (i, Array.tabulate(8)(j => ((i * 3 + j) % 10).toFloat / 10f)))
      .toDF("id", "vec")
    val cb = ProductQuantizer.trainCodebook(df, "vec", clusters = 16,
      subvectors = 4, seed = 3)
    val tmp = Files.createTempDirectory("graft-pqann2").toString
    PqAnnIndex.build(df, "id", "vec", s"$tmp/idx", cb,
      AnnParams(m = 8, numPartitions = 1))
    val q = Array.tabulate(8)(j => (j % 10).toFloat / 10f) // == vec of id 0
    val res = PqAnnIndex.search(spark, s"$tmp/idx", q, 5)
    assert(res.length === 5)
    assert(res.map(_._2).toSeq === res.map(_._2).sorted.toSeq)
    // the query equals row 0's raw vector; its quantized form must be
    // among the very nearest under the LUT distance
    assert(res.take(2).map(_._1).contains(0L))
  }

  test("searchRerank recall@10 >= 0.8 vs exact at 2000 vectors") {
    val e = Tables.embeddings(spark, sf("sf0.1")).cache()
    try {
      val cb = ProductQuantizer.trainCodebook(
        e, "embedding", clusters = 64, subvectors = 32, seed = 7)
      val tmp = Files.createTempDirectory("graft-pqann3").toString
      PqAnnIndex.build(e, "vec_id", "embedding", s"$tmp/idx", cb,
        AnnParams(m = 16, efConstruction = 128, numPartitions = 2))
      val queries = e.where(col("vec_id") < 5).select("vec_id", "embedding").collect()
      val recalls = queries.map { row =>
        val q = row.getSeq[Float](1).toArray
        val exact = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
          .orderBy(col("d"), col("vec_id")).limit(10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val got = PqAnnIndex.searchRerank(
          e, "vec_id", "embedding", s"$tmp/idx", q, 10, ef = 100)
          .map(_._1).toSet
        exact.intersect(got).size / 10.0
      }
      val avg = recalls.sum / recalls.length
      assert(avg >= 0.8, s"searchRerank recall $avg at 2000 vectors")
    } finally { e.unpersist(); () }
  }

  test("PQ index rejects unsupported metrics (l2sq|cos only)") {
    import spark.implicits._
    val df = Seq((1L, Array(0f, 0f))).toDF("id", "vec")
    val cb = graft.pq.PqCodebook(2, Array(Array(Array(0f), Array(1f)),
      Array(Array(0f), Array(1f))))
    intercept[IllegalArgumentException] {
      PqAnnIndex.build(df, "id", "vec", "/tmp/x", cb,
        AnnParams(metric = "hamming"))
    }
    intercept[IllegalArgumentException] {
      PqAnnIndex.build(df, "id", "vec", "/tmp/x", cb,
        AnnParams(metric = "inner"))
    }
  }

  test("cos PQ index: normalized geometry, searchMany cos ordering matches exact") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
    val unit = e.select(col("vec_id"),
      org.apache.spark.sql.graftshim.GraftSqlShim.column(
        graft.functions.UnitNormalize(
          org.apache.spark.sql.graftshim.GraftSqlShim.expression(
            col("embedding")))).as("embedding"))
    val cb = graft.pq.ProductQuantizer.trainCodebook(
      unit, "embedding", subvectors = 8, clusters = 32, seed = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqcos")
      .toString + "/idx"
    PqAnnIndex.build(e, "vec_id", "embedding", dir, cb,
      AnnParams(m = 16, efConstruction = 128, ef = 128,
        metric = "cos", numPartitions = 2))
    val queries = e.orderBy("vec_id").limit(5)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val ann = PqAnnIndex.searchMany(spark, dir, queries, k = 5, ef = 256,
        rerank = Some((e, "vec_id", "embedding")), metric = "cos")
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val qDf = queries.map { case (qid, q) => (qid, q.toSeq) }
      .toDF("query_id", "qv")
    val exact = graft.ops.VectorSearch.knnJoinExact(
        qDf, "query_id", "qv", e, "vec_id", "embedding", 5, metric = "cos")
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.map { case (qid, ex) =>
      ann.getOrElse(qid, Set.empty[Long]).intersect(ex).size
    }.sum
    assert(hits >= (0.8 * 25).ceil.toInt, s"cos PQ recall $hits/25")
  }
}
