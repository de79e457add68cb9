package graft.ann

import graft.{SparkTestBase, Tables}

class AutotuneSpec extends SparkTestBase {

  test("autotune measures all grid variants and picks one meeting target recall") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val report = Autotune.autotune(
      e, "vec_id", "embedding",
      k = 10, queryCount = 5, targetRecall = 0.8)

    assert(report.results.size === Autotune.DefaultGrid.size)
    report.results.foreach { r =>
      assert(r.recall >= 0.0 && r.recall <= 1.0)
      assert(r.buildSecs > 0 && r.avgSearchMs > 0)
    }
    assert(report.picked.isDefined, "some variant must reach recall 0.8 on 500 rows")
    assert(report.picked.get.recall >= 0.8)
    // picked is the CHEAPEST qualifying variant (grid is cost-ordered)
    val idx = report.results.indexOf(report.picked.get)
    assert(report.results.take(idx).forall(_.recall < 0.8))

    val df = Autotune.reportDf(spark, report)
    assert(df.count() === 6)
    assert(df.where(org.apache.spark.sql.functions.col("picked")).count() === 1)
  }

  test("IVF autotune measures the grid and picks cheapest meeting target") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val report = Autotune.autotuneIvf(
      e, "vec_id", "embedding", k = 10, queryCount = 3, targetRecall = 0.7)
    assert(report.results.size === 6)
    report.results.foreach(r => assert(r.recall >= 0.0 && r.recall <= 1.0))
    assert(report.picked.isDefined)
    assert(report.picked.get.recall >= 0.7)
    // results ordered by probe fraction: recall must reach 1.0 when
    // probing every list... not in grid; but full-probe equivalence is
    // covered in IvfSpec. Here: the pick is the FIRST qualifying entry.
    val idx = report.results.indexOf(report.picked.get)
    assert(report.results.take(idx).forall(_.recall < 0.7))
  }

  test("BQ autotune: one build, nested pools, monotone recall, cheapest pick") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val n = e.count().toInt
    val report = Autotune.autotuneBq(
      e, "vec_id", "embedding", k = 10, queryCount = 5,
      targetRecall = 0.9, pools = Seq(10, 20, n))
    assert(report.results.map(_.pool) == Seq(10, 20, n))
    assert(report.buildSecs > 0)
    // candidate sets nest as the pool widens and stage 2 is exact, so
    // recall is non-decreasing — and pool = corpus is EXACT
    assert(report.results.map(_.recall).sliding(2)
      .forall(p => p.length < 2 || p(0) <= p(1) + 1e-9))
    assert(report.results.last.recall == 1.0)
    assert(report.picked.isDefined)
    val idx = report.results.indexOf(report.picked.get)
    assert(report.results.take(idx).forall(_.recall < 0.9))
    val df = Autotune.bqReportDf(spark, report)
    assert(df.count() === 3)
    assert(df.where(org.apache.spark.sql.functions.col("picked")).count() === 1)
  }

  test("autotuneCreate promotes the winning trial to the target path and it searches") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val target = java.nio.file.Files
      .createTempDirectory("graft-create-best").toString + "/best"
    val report = Autotune.autotuneCreate(
      e, "vec_id", "embedding", target,
      k = 10, queryCount = 3, targetRecall = 0.8,
      grid = Seq(Autotune.Variant(6, 32, 64), Autotune.Variant(16, 60, 76)))
    assert(report.picked.isDefined)
    // trials cleaned, target present and searchable
    assert(!new java.io.File(target + ".autotune-trials").exists())
    val q = e.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val got = AnnIndex.search(spark, target, q, 5).map(_._1)
    assert(got.size === 5)
    assert(got.contains(0L), "query vector itself must be a neighbor")
    // unreachable target: throws but still cleans trials
    val t2 = java.nio.file.Files
      .createTempDirectory("graft-create-none").toString + "/best"
    intercept[IllegalStateException] {
      Autotune.autotuneCreate(e, "vec_id", "embedding", t2,
        targetRecall = 1.1, grid = Seq(Autotune.Variant(6, 32, 64)))
    }
    assert(!new java.io.File(t2 + ".autotune-trials").exists())
    assert(!new java.io.File(t2).exists())
  }

  test("autotuneIvfCreate promotes the winning list layout and it searches") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val target = java.nio.file.Files
      .createTempDirectory("graft-ivf-best").toString + "/best"
    val report = Autotune.autotuneIvfCreate(
      e, "vec_id", "embedding", target,
      k = 10, queryCount = 3, targetRecall = 0.7)
    assert(report.picked.isDefined)
    assert(!new java.io.File(target + ".autotune-trials").exists())
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val got = IvfIndex.search(spark, target, q, 5,
        nprobe = report.picked.get.variant.nprobe)
      .select("id").collect().map(_.getLong(0))
    assert(got.length === 5)
    assert(got.contains(0L), "query vector itself must be a neighbor")
  }

  test("unreachable target yields no pick but a full report") {
    val e = Tables.embeddings(spark, sf("sf0.001")).limit(50)
    val report = Autotune.autotune(
      e, "vec_id", "embedding", k = 5, queryCount = 2,
      targetRecall = 1.1, // impossible
      grid = Seq(Autotune.Variant(6, 32, 64)))
    assert(report.results.size === 1)
    assert(report.picked.isEmpty)
  }
}
