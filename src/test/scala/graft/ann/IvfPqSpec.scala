package graft.ann

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.l2sq_dist

class IvfPqSpec extends SparkTestBase {
  import spark.implicits._

  private def sfDir(name: String) = s"/root/testdata/$name"

  test("IVF-PQ with rerank recovers the exact top-10; codes are compact") {
    val e = Tables.embeddings(spark, sfDir("sf0.001"))
    val path = Files.createTempDirectory("graft-ivfpq").toString + "/idx"
    IvfPqIndex.build(e, "vec_id", "embedding", path,
      nlists = 8, subvectors = 8, clusters = 64)
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray

    // 48-bit codes on near-random 64-dim data put the worst true
    // neighbor around LUT rank ~70 of 500 (measured); ef=128 gives the
    // rerank pool real headroom without scanning floats
    val got = IvfPqIndex.search(spark, path, q, k = 10, nprobe = 8,
        rerank = Some((e, "vec_id", "embedding")), ef = 128)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id", "d").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // full probe + exact rerank with a wide candidate pool → exact ids
    val recall = got.map(_._1).toSet.intersect(exact.map(_._1).toSet).size
    assert(recall >= 8, s"recall@10 $recall/10\ngot ${got.toSeq}\nexact ${exact.toSeq}")
    // reranked distances are the TRUE metric distances
    val exactById = exact.toMap
    got.foreach { case (id, d) =>
      exactById.get(id).foreach(ed => assert(math.abs(d - ed) < 1e-12))
    }
    // the index stores codes, not floats: 8 shorts vs 64 floats
    val row = spark.read.parquet(s"$path/data").head()
    assert(row.schema.fieldNames.toSet == Set("id", "codes", "list_id"))
    assert(row.getSeq[Short](row.fieldIndex("codes")).length == 8)
  }

  test("probed scan partition-prunes unvisited lists; LUT-only mode ranks sanely") {
    val e = Tables.embeddings(spark, sfDir("sf0.001"))
    val path = Files.createTempDirectory("graft-ivfpq2").toString + "/idx"
    IvfPqIndex.build(e, "vec_id", "embedding", path,
      nlists = 8, subvectors = 8, clusters = 16)
    val q = e.where(col("vec_id") === 1).select("embedding")
      .head().getSeq[Float](0).toArray

    val lutOnly = IvfPqIndex.search(spark, path, q, k = 20, nprobe = 2)
    val p = lutOnly.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString.contains("list_id"), p.take(800))
    // LUT estimate must put the query's own vector (distance 0 to
    // itself) at or near the front even without rerank
    val ids = lutOnly.collect().map(_.getLong(0)).take(5)
    assert(ids.contains(1L), s"self id missing from LUT top-5: ${ids.toSeq}")
  }

  test("cos metric normalizes both sides; tombstoned ids vanish") {
    val e = Tables.embeddings(spark, sfDir("sf0.001"))
    val path = Files.createTempDirectory("graft-ivfpq3").toString + "/idx"
    IvfPqIndex.build(e, "vec_id", "embedding", path,
      nlists = 4, subvectors = 8, clusters = 16, metric = "cos")
    val q = e.where(col("vec_id") === 2).select("embedding")
      .head().getSeq[Float](0).toArray
    val before = IvfPqIndex.search(spark, path, q, k = 5, nprobe = 4,
      rerank = Some((e, "vec_id", "embedding")))
      .collect().map(_.getLong(0))
    assert(before.contains(2L), s"self missing under cos: ${before.toSeq}")
    IvfPqIndex.delete(spark, path, Seq(2L))
    val after = IvfPqIndex.search(spark, path, q, k = 5, nprobe = 4,
      rerank = Some((e, "vec_id", "embedding")))
      .collect().map(_.getLong(0))
    assert(!after.contains(2L), s"tombstoned id still served: ${after.toSeq}")
  }

  test("searchMany with rerank matches per-query reranked search") {
    val e = Tables.embeddings(spark, sfDir("sf0.001"))
    val path = Files.createTempDirectory("graft-ivfpqm").toString + "/idx"
    IvfPqIndex.build(e, "vec_id", "embedding", path,
      nlists = 8, subvectors = 8, clusters = 64)
    val queries = e.where(col("vec_id") < 4)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val batch = IvfPqIndex.searchMany(spark, path, queries, k = 5,
        nprobe = 4, ef = 128, rerank = Some((e, "vec_id", "embedding")))
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    queries.foreach { case (qid, q) =>
      val single = IvfPqIndex.search(spark, path, q, k = 5, nprobe = 4,
          rerank = Some((e, "vec_id", "embedding")), ef = 128)
        .collect().map(_.getLong(0)).toSeq
      val got = batch.filter(_._1 == qid).sortBy(_._3).map(_._2).toSeq
      assert(got === single, s"qid=$qid")
    }
  }
}
