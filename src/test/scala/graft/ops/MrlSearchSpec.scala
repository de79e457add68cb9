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

  test("prepacked path: identical results, stage-1 scan excludes the vector") {
    val qs = queries(4)
    val dir = java.nio.file.Files.createTempDirectory("graft-mrlp").toString
    e.select(col("vec_id"), MrlSearch.prefix(col("embedding"), 16).as("pref"))
      .write.parquet(s"$dir/pref")
    val pre = spark.read.parquet(s"$dir/pref")
    val inline = MrlSearch.topKMany(
      e, "vec_id", "embedding", qs, k = 5, pool = 32, m = 16)
    val packed = MrlSearch.topKManyPrepacked(
      pre, "vec_id", "pref", e, "embedding", qs, k = 5, pool = 32, m = 16)
    assert(asTriples(inline) == asTriples(packed))
    // the prefix table's scan reads (vec_id, pref) only — the full
    // vector column appears in the rescore join-back scan alone
    val p = MaskedExplain.explain(packed, "formatted")
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.exists(l => l.contains("pref") && !l.contains("embedding")),
      schemas.mkString("\n"))
    // stage-1's shuffle carries id pairs, not vectors: no Exchange
    // input schema contains the prefix or vector columns above the
    // window — proxy assert: the window runs over (query_id, id, dist)
    assert(p.contains("WindowGroupLimit"), p.take(800))
  }

  test("MrlIndex lifecycle + full-pool scalar rewrite is exact; delete masks") {
    import graft.ann.MrlIndex
    import graft.plans.{AnnCatalog, AnnScanLogical}
    val dir = java.nio.file.Files.createTempDirectory("graft-mrlidx").toString
    val n = e.count()
    val half = n / 2
    // build over the first half, append the rest — same artifact as a
    // one-shot build (the prefix is a pure projection)
    MrlIndex.build(e.where(col("vec_id") < half), "vec_id", "embedding",
      m = 16, dir)
    assert(MrlIndex.m(spark, dir) == 16)
    MrlIndex.append(e.where(col("vec_id") >= half), "vec_id", "embedding", dir)
    assert(MrlIndex.livePrefixes(spark, dir).count() == n)
    val tablePath = sf("sf0.001") + "/embeddings.parquet"
    AnnCatalog.register(spark, tablePath, AnnCatalog.IndexMeta(
      dir, "vec_id", "embedding", "l2sq", ef = n.toInt, kind = "mrl"))
    try {
      val q = e.where(col("vec_id") === 3).select("embedding")
        .head().getSeq[Float](0).toArray
      val knn = e.orderBy(graft.functions.l2sq_dist(col("embedding"), lit(q)))
        .limit(5)
      assert(knn.queryExecution.optimizedPlan.collect {
        case a: AnnScanLogical if a.kind == "mrl" => a }.nonEmpty)
      val got = knn.select("vec_id").collect().map(_.getLong(0)).toSeq
      // pool = corpus ⇒ the rescore sees every row ⇒ exact top-5
      val exact = asTriples(VectorSearch.knnJoinExact(
        Seq((0L, q.toSeq)).toDF("query_id", "qv"), "query_id", "qv",
        e, "vec_id", "embedding", 5, "l2sq"))
        .toSeq.sortBy(_._3).map(_._2)
      assert(got.toSet == exact.toSet, s"$got vs $exact")
      // tombstoned ids never surface through the planner path
      MrlIndex.delete(spark, dir, Seq(got.head))
      val after = e
        .orderBy(graft.functions.l2sq_dist(col("embedding"), lit(q)))
        .limit(5).select("vec_id").collect().map(_.getLong(0)).toSet
      assert(!after.contains(got.head) && after.nonEmpty)
      // consolidate: physical delete, one file, tombstones retired,
      // results unchanged
      MrlIndex.consolidate(spark, dir)
      assert(MrlIndex.fileCount(spark, dir) == 1)
      assert(MrlIndex.livePrefixes(spark, dir).count() == n - 1)
      assert(!new java.io.File(s"$dir/tombstones").exists())
      val afterCons = e
        .orderBy(graft.functions.l2sq_dist(col("embedding"), lit(q)))
        .limit(5).select("vec_id").collect().map(_.getLong(0)).toSet
      assert(afterCons == after)
    } finally AnnCatalog.unregister(spark, tablePath)
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
