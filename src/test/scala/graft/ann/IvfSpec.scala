package graft.ann

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.l2sq_dist

class IvfSpec extends SparkTestBase {

  test("IVF search prunes unprobed list partitions at planning time") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val path = Files.createTempDirectory("graft-ivf").toString + "/idx"
    IvfIndex.build(e, "vec_id", "embedding", path, nlists = 8)
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray

    val (scan, _, _) = IvfIndex.probedScan(spark, path, q, nprobe = 2)
    val p = scan.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("list_id"), p.take(800))
    // only the probed partitions are read
    val lists = scan.select("list_id").distinct().collect().map(_.getInt(0)).toSet
    assert(lists.size <= 2)
  }

  test("IVF recall grows with nprobe; full probe equals exact") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val path = Files.createTempDirectory("graft-ivf2").toString + "/idx"
    IvfIndex.build(e, "vec_id", "embedding", path, nlists = 8)

    val queries = e.where(col("vec_id") < 3).select("vec_id", "embedding")
      .collect().map(_.getSeq[Float](1).toArray)

    def recallAt(nprobe: Int): Double = queries.map { q =>
      val got = IvfIndex.search(spark, path, q, 10, nprobe)
        .select("id").collect().map(_.getLong(0)).toSet
      val exact = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      got.intersect(exact).size / 10.0
    }.sum / queries.length

    val rFull = recallAt(8)
    assert(rFull === 1.0, s"full probe must be exact, got $rFull")
    val rHalf = recallAt(4)
    assert(rHalf >= 0.5, s"nprobe=4 recall $rHalf")
    assert(rFull >= rHalf)
  }

  test("IVF tombstone deletes mask rows at search") {
    import spark.implicits._
    val df = (0L until 50L).map(i => (i, Array(i.toFloat, 0f))).toDF("id", "vec")
    val path = Files.createTempDirectory("graft-ivfdel").toString + "/idx"
    IvfIndex.build(df, "id", "vec", path, nlists = 2)
    val q = Array(7f, 0f)
    assert(IvfIndex.search(spark, path, q, 1, nprobe = 2)
      .head().getLong(0) === 7L)
    IvfIndex.delete(spark, path, Seq(7L))
    assert(IvfIndex.search(spark, path, q, 1, nprobe = 2)
      .head().getLong(0) !== 7L)
  }

  test("cosine metric: normalized at build, search orders by cosine") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(10f, 0f)), // same direction as query, big norm
      (2L, Array(0.1f, 0.0f)), // same direction, tiny norm
      (3L, Array(0f, 1f))) // orthogonal
      .toDF("id", "vec")
    val path = Files.createTempDirectory("graft-ivf3").toString + "/idx"
    IvfIndex.build(df, "id", "vec", path, nlists = 2, metric = "cos")
    val res = IvfIndex.search(spark, path, Array(1f, 0f), 3, nprobe = 2)
      .collect().map(_.getLong(0))
    // both same-direction vectors tie at cos-dist 0 (id order), then orthogonal
    assert(res.toSeq === Seq(1L, 2L, 3L))
  }

  test("searchMany matches per-query search (one pruned pass, all queries)") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val path = Files.createTempDirectory("graft-ivfm").toString + "/idx"
    IvfIndex.build(e, "vec_id", "embedding", path, nlists = 8)
    val queries = e.where(col("vec_id") < 4)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val batch = IvfIndex.searchMany(spark, path, queries, k = 5, nprobe = 3)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    queries.foreach { case (qid, q) =>
      val single = IvfIndex.search(spark, path, q, 5, nprobe = 3)
        .collect().map(_.getLong(0)).toSeq
      val got = batch.filter(_._1 == qid).sortBy(_._3).map(_._2).toSeq
      assert(got === single, s"qid=$qid")
    }
  }
}
