package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.ann.{AnnIndex, AnnParams}
import graft.ops.WeightedSearch.Term

class WeightedSearchSpec extends SparkTestBase {

  test("exact weighted search computes joint distance and respects maxDist") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0f, 0f), Array(1f, 1f)),
      (2L, Array(1f, 0f), Array(0f, 0f)),
      (3L, Array(5f, 5f), Array(5f, 5f))).toDF("id", "v1", "v2")
    val terms = Seq(
      Term(0.5, "v1", Array(0f, 0f)),
      Term(0.5, "v2", Array(0f, 0f)))
    // joint: id1 = 0.5*0 + 0.5*2 = 1; id2 = 0.5*1 + 0.5*0 = 0.5; id3 = 50
    val res = WeightedSearch.exact(df, terms, k = 3, tieBreak = Seq(col("id")))
      .select("id", "joint_dist").collect()
    assert(res.map(_.getLong(0)).toSeq === Seq(2L, 1L, 3L))
    assert(res.map(_.getDouble(1)).toSeq === Seq(0.5, 1.0, 50.0))

    val capped = WeightedSearch.exact(df, terms, k = 3, maxDist = Some(1.5))
    assert(capped.count() === 2)
  }

  test("term count validated; presets override the metric") {
    import spark.implicits._
    val df = Seq((1L, Array(1f, 0f))).toDF("id", "v1")
    intercept[IllegalArgumentException] {
      WeightedSearch.exact(df, Nil, k = 1)
    }
    // cos preset: distance of parallel vectors is 0 regardless of scale
    val res = WeightedSearch
      .exactCos(df, Seq(Term(1.0, "v1", Array(10f, 0f))), k = 1)
      .select("joint_dist").head().getDouble(0)
    assert(res === 0.0)
  }

  test("ANN weighted variant re-ranks union of per-index candidates") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val path = Files.createTempDirectory("graft-wann").toString + "/idx"
    AnnIndex.build(e, "vec_id", "embedding", path, AnnParams(numPartitions = 2))
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val q2 = e.where(col("vec_id") === 1).select("embedding")
      .head().getSeq[Float](0).toArray

    val terms = Seq(
      (Term(0.6, "embedding", q), path),
      (Term(0.4, "embedding", q2), path))
    val ann = WeightedSearch.ann(spark, e, "vec_id", terms, k = 5, ef = 64)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ann.size === 5)

    val exact = WeightedSearch
      .exact(e, terms.map(_._1), k = 5, tieBreak = Seq(col("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    // recall of the ANN-candidate re-rank vs exact joint top-5
    assert(ann.toSet.intersect(exact.toSet).size >= 4,
      s"ann=$ann exact=$exact")
  }
}
