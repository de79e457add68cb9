package graft.ann

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.l2sq_dist
import graft.plans.AnnCatalog

/** Index-vs-exact equivalence and composability — the Spark analogs of
  * the reference's `hnsw_correct.sql:16-48` (same query with and
  * without index returns identical rows on unique-distance data) and
  * `hnsw_select.sql:21-72` (index still used under UNION / GROUP BY /
  * subqueries).
  */
class AnnCorrectSpec extends SparkTestBase {

  test("with-index results equal exact results row-for-row at high ef (hnsw_correct analog)") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val path = Files.createTempDirectory("graft-correct").toString + "/idx"
    // single shard + generous ef: deterministic (fixed seeds) and, as
    // verified here, exhaustive on this corpus
    AnnIndex.build(e, "vec_id", "embedding", path,
      AnnParams(m = 32, efConstruction = 200, ef = 400, numPartitions = 1))
    (0 until 5).foreach { qi =>
      val q = e.where(col("vec_id") === qi).select("embedding")
        .head().getSeq[Float](0).toArray
      val exact = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val ann = AnnIndex.search(spark, path, q, 10, efOverride = 400)
        .map(_._1).toSeq
      assert(ann === exact, s"query $qi")
    }
  }

  test("ANN rewrite composes under UNION, GROUP BY and subqueries (hnsw_select analog)") {
    val dir = sf("sf0.001")
    val tmp = Files.createTempDirectory("graft-compose").toString
    val e = Tables.embeddings(spark, dir)
    AnnIndex.build(e, "vec_id", "embedding", s"$tmp/idx", AnnParams(numPartitions = 2))
    val q1 = e.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val q2 = e.where(col("vec_id") === 1).select("embedding").head().getSeq[Float](0).toArray
    AnnCatalog.register(spark, s"$dir/embeddings.parquet",
      AnnCatalog.IndexMeta(s"$tmp/idx", "vec_id", "embedding", "l2sq", ef = 64))
    try {
      def hasAnn(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case a: graft.plans.AnnScanLogical => a
        }.size
      def knn(q: Array[Float]) = e.select(col("vec_id"), col("embedding"))
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(5)

      // UNION of two ANN queries: both inner limits rewrite
      val union = knn(q1).unionByName(knn(q2))
      assert(hasAnn(union) === 2, "both union branches must use the index")
      assert(union.count() === 10)

      // GROUP BY over an ANN result: rewrite below the aggregate
      val grouped = knn(q1).groupBy(col("vec_id")).count()
      assert(hasAnn(grouped) === 1)
      assert(grouped.count() === 5)

      // subquery/CTE shape via DataFrame chaining: filter ABOVE the knn
      // (post-filter of index results, like the reference's WHERE-above-
      // LATERAL) keeps the rewrite
      val post = knn(q1).where(col("vec_id") > 0)
      assert(hasAnn(post) === 1)
    } finally AnnCatalog.unregister(spark, s"$dir/embeddings.parquet")
  }

  test("planner rule routes to IVF and PQ index kinds; multiple indexes per table") {
    import graft.pq.ProductQuantizer
    val dir = sf("sf0.001")
    val tmp = Files.createTempDirectory("graft-kinds").toString
    val e = Tables.embeddings(spark, dir)
    val q = e.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray

    IvfIndex.build(e, "vec_id", "embedding", s"$tmp/ivf", nlists = 8)
    val cb = ProductQuantizer.trainCodebook(e, "embedding",
      clusters = 64, subvectors = 32, seed = 7)
    PqAnnIndex.build(e, "vec_id", "embedding", s"$tmp/pq", cb,
      AnnParams(numPartitions = 2))

    def hasAnn(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case a: graft.plans.AnnScanLogical => a
      }.nonEmpty
    val qs = (0 until 3).map { i =>
      e.where(col("vec_id") === i).select("embedding").head().getSeq[Float](0).toArray
    }
    def knnFor(qq: Array[Float]) = e.select(col("vec_id"), col("embedding"))
      .orderBy(l2sq_dist(col("embedding"), lit(qq))).limit(10)
    def knn = knnFor(q)

    // minRecall: IVF re-ranks true vectors (exact within probed lists);
    // PQ re-ranks dequantized vectors, so it carries the quantization
    // recall budget (reference gates PQ at drop < 0.2 on AVERAGE —
    // hnsw_pq.sql:83-86)
    def checkKind(kind: String, artifact: String, ef: Int, minRecall: Double): Unit = {
      AnnCatalog.register(spark, s"$dir/embeddings.parquet",
        AnnCatalog.IndexMeta(artifact, "vec_id", "embedding", "l2sq", ef, kind))
      try {
        assert(hasAnn(knn), s"$kind index must trigger the rewrite")
        val recalls = qs.map { qq =>
          val exact = e.withColumn("d", l2sq_dist(col("embedding"), lit(qq)))
            .orderBy(col("d"), col("vec_id")).limit(10)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          val got = knnFor(qq).select("vec_id").collect().map(_.getLong(0)).toSet
          got.intersect(exact).size.toDouble / exact.size
        }
        val avg = recalls.sum / recalls.size
        assert(avg >= minRecall, s"$kind avg recall $avg")
      } finally AnnCatalog.unregister(spark, s"$dir/embeddings.parquet")
    }
    checkKind("ivf", s"$tmp/ivf", ef = 4, minRecall = 0.8) // ef = nprobe for IVF
    checkKind("pq", s"$tmp/pq", ef = 64, minRecall = 0.75)

    // IVF-PQ: ef is the residual-LUT pool width AND the meta's nprobe
    // must reach the scan (a dropped nprobe silently probes 1 list)
    graft.ann.IvfPqIndex.build(e, "vec_id", "embedding", s"$tmp/ivfpq",
      nlists = 8, subvectors = 8, clusters = 64)
    AnnCatalog.register(spark, s"$dir/embeddings.parquet",
      AnnCatalog.IndexMeta(s"$tmp/ivfpq", "vec_id", "embedding", "l2sq",
        ef = 128, kind = "ivfpq", nprobe = 8))
    try {
      val scans = knn.queryExecution.optimizedPlan.collect {
        case a: graft.plans.AnnScanLogical => a
      }
      assert(scans.size === 1 && scans.head.kind === "ivfpq")
      assert(scans.head.nprobe === 8, "meta nprobe must reach the scan")
      assert(scans.head.ef === 128)
      val exact = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val got = knn.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got.intersect(exact).size >= 8, s"ivfpq planner recall: $got")
      // reconstruction must never leak: vec column is the stored floats
      val truth = e.select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      knn.collect().foreach { r =>
        assert(r.getSeq[Float](1) === truth(r.getLong(0)),
          "ivfpq must serve TRUE vectors via join-back, not reconstructions")
      }
    } finally AnnCatalog.unregister(spark, s"$dir/embeddings.parquet")

    // a PQ index must NEVER leak dequantized vectors as the table's
    // vector column: even the narrow (id, vec)-only shape goes through
    // the join-back form and returns the TRUE stored embeddings
    AnnCatalog.register(spark, s"$dir/embeddings.parquet",
      AnnCatalog.IndexMeta(s"$tmp/pq", "vec_id", "embedding", "l2sq", 64, "pq"))
    try {
      val rows = knnFor(q).collect()
      val truth = e.select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      rows.foreach { r =>
        assert(r.getSeq[Float](1) === truth(r.getLong(0)),
          s"vec for ${r.getLong(0)} must be the stored value, not dequantized")
      }
    } finally AnnCatalog.unregister(spark, s"$dir/embeddings.parquet")

    // two indexes on one table: cos registered alongside l2sq; the rule
    // picks by the sort expression's metric
    val floatIdx = s"$tmp/hnsw"
    AnnIndex.build(e, "vec_id", "embedding", floatIdx, AnnParams(numPartitions = 2))
    AnnCatalog.register(spark, s"$dir/embeddings.parquet",
      AnnCatalog.IndexMeta(floatIdx, "vec_id", "embedding", "l2sq", 64, "hnsw"))
    AnnCatalog.register(spark, s"$dir/embeddings.parquet",
      AnnCatalog.IndexMeta(s"$tmp/ivf", "vec_id", "embedding", "cos", 4, "ivf"))
    try {
      assert(hasAnn(knn), "l2sq sort must match the l2sq index")
      val cosKnn = e.select(col("vec_id"), col("embedding"))
        .orderBy(graft.functions.cos_dist(col("embedding"), lit(q))).limit(5)
      assert(hasAnn(cosKnn), "cos sort must match the cos index")
    } finally AnnCatalog.unregister(spark, s"$dir/embeddings.parquet")
  }

  test("planner routes an explicit nprobe to IVF scans, never ef") {
    val dir = sf("sf0.001")
    val tmp = Files.createTempDirectory("graft-nprobe").toString
    val e = Tables.embeddings(spark, dir)
    val q = e.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    IvfIndex.build(e, "vec_id", "embedding", s"$tmp/ivf", nlists = 8)
    def annParam(meta: AnnCatalog.IndexMeta): Int = {
      AnnCatalog.register(spark, s"$dir/embeddings.parquet", meta)
      try {
        val knn = e.select(col("vec_id"), col("embedding"))
          .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(5)
        val scans = knn.queryExecution.optimizedPlan.collect {
          case a: graft.plans.AnnScanLogical => a
        }
        assert(scans.size === 1)
        scans.head.ef
      } finally AnnCatalog.unregister(spark, s"$dir/embeddings.parquet")
    }
    // explicit nprobe flows through
    assert(annParam(AnnCatalog.IndexMeta(s"$tmp/ivf", "vec_id", "embedding",
      "l2sq", ef = 64, kind = "ivf", nprobe = 2)) === 2)
    // unset nprobe → IVF default, NOT the (full-probe) ef
    assert(annParam(AnnCatalog.IndexMeta(s"$tmp/ivf", "vec_id", "embedding",
      "l2sq", ef = 64, kind = "ivf")) === 8)
    // hnsw still takes max(ef, k)
    val hnswIdx = s"$tmp/hnsw"
    AnnIndex.build(e, "vec_id", "embedding", hnswIdx, AnnParams(numPartitions = 1))
    assert(annParam(AnnCatalog.IndexMeta(hnswIdx, "vec_id", "embedding",
      "l2sq", ef = 64)) === 64)
  }

  test("missing artifact fails with a clear error") {
    val ex = intercept[Exception] {
      AnnIndex.search(spark, "/tmp/graft-definitely-missing/idx", Array(1f), 1)
    }
    assert(ex.getMessage != null)
  }

  test("midsize distributed build: 10k vectors, 4 shards, recall holds") {
    import spark.implicits._
    val rng = new java.util.Random(5)
    val dim = 16
    val data = (0L until 10000L).map(i => (i, Array.fill(dim)(rng.nextFloat())))
    val df = data.toDF("id", "vec").repartition(4)
    val path = Files.createTempDirectory("graft-mid").toString + "/idx"
    AnnIndex.build(df, "id", "vec", path, AnnParams(numPartitions = 4))

    val recalls = (0 until 5).map { _ =>
      val q = Array.fill(dim)(rng.nextFloat())
      val exact = data.map { case (id, v) =>
        (id, Metric.dist(Metric.L2Sq, q, v))
      }.sortBy(x => (x._2, x._1)).take(10).map(_._1).toSet
      val ann = AnnIndex.search(spark, path, q, 10).map(_._1).toSet
      ann.intersect(exact).size / 10.0
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.85, s"midsize recall $avg")
  }
}
