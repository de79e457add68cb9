package graft.util

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.pq.ProductQuantizer

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("hashSample is invariant to partition layout and row order") {
    val base = (1L to 1000L).map(i => (i, s"row-$i")).toDF("id", "payload")
    val a = Sampling.hashSample(base, 100, col("id"))
      .collect().map(_.getLong(0)).toSeq
    val shuffled = base.orderBy($"id".desc).repartition(7)
    val b = Sampling.hashSample(shuffled, 100, col("id"))
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "sample must be a pure function of the data")
    assert(a.distinct.size == 100)
    // and it is not just the first ids in input order (what limit() did)
    assert(a.toSet != (1L to 100L).toSet)
  }

  test("PQ codebook is invariant to input file order") {
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(300)(Array.fill(8)(rnd.nextFloat())).map(v => Tuple1(v.toSeq))
    val df = vecs.toDF("v")
    val cb1 = ProductQuantizer.trainCodebook(df, "v", clusters = 4, subvectors = 2,
      sampleLimit = 200)
    val cb2 = ProductQuantizer.trainCodebook(
      df.orderBy(expr("v[0]").desc).repartition(5), "v",
      clusters = 4, subvectors = 2, sampleLimit = 200)
    assert(cb1.centroids.flatten.flatten.toSeq == cb2.centroids.flatten.flatten.toSeq,
      "same data in a different order must fit the identical codebook")
  }
}
