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
