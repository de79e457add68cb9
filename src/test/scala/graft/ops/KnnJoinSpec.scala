package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.ann.{AnnIndex, AnnParams}
import graft.embed.{HashEmbeddingRuntime, MeasureSpeed}

class KnnJoinSpec extends SparkTestBase {

  test("knnJoinExact: per-query top-k with rank, golden values") {
    import spark.implicits._
    val queries = Seq((100L, Array(0f, 0f)), (200L, Array(10f, 10f)))
      .toDF("qid", "qv")
    val data = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 2f)),
      (3L, Array(9f, 10f)), (4L, Array(5f, 5f))).toDF("id", "v")
    val res = VectorSearch
      .knnJoinExact(queries, "qid", "qv", data, "id", "v", k = 2)
      .orderBy("query_id", "rank").collect()
    assert(res.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq === Seq(
      (100L, 1L, 1), (100L, 2L, 2), (200L, 3L, 1), (200L, 4L, 2)))
    assert(res.head.getDouble(2) === 1.0) // dist(origin, (1,0)) l2sq
  }

  test("searchMany matches exact knn join with high recall (batch ANN)") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val path = Files.createTempDirectory("graft-many").toString + "/idx"
    AnnIndex.build(e, "vec_id", "embedding", path, AnnParams(numPartitions = 2))
    val queries = e.where(col("vec_id") < 5)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

    val ann = AnnIndex.searchMany(spark, path, queries, k = 10)
    assert(ann.groupBy("query_id").count().count() === 5)

    val exact = VectorSearch.knnJoinExact(
      e.where(col("vec_id") < 5), "vec_id", "embedding",
      e, "vec_id", "embedding", k = 10)
    val annSet = ann.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactSet = exact.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = annSet.intersect(exactSet).size.toDouble / exactSet.size
    assert(recall >= 0.8, s"batch recall $recall")
  }

  test("measure-model-speed reports positive tokens/sec") {
    val s = MeasureSpeed.measure(
      new HashEmbeddingRuntime(), "mock/tiny",
      (1 to 100).map(i => s"some text number $i with several tokens"))
    assert(s.tokensPerSec > 0 && s.itemsPerSec > 0)
    assert(s.totalTokens === 100L * 7)
  }
}
