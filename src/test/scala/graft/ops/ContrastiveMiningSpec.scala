package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ContrastiveMiningSpec extends SparkTestBase {
  import spark.implicits._

  test("triplets: negative exists, differs from pair, avoids neighborhood") {
    // ids 0/1 nearly parallel (positive pair) — first two dims strictly
    // positive so both land in the same sign-LSH bucket; 2..9 fill
    val rows = Seq(
      (0L, Array(1f, 0.02f, 0.01f)),
      (1L, Array(1f, 0.01f, 0.02f))) ++
      (2L to 9L).map(i => (i, Array(0f, 1f, i.toFloat)))
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("bucket", Dedup.embeddingLshBucketAxis(col("embedding"), 2))
    val out = ContrastiveMining
      .mineTriplets(df, "vec_id", "embedding", "bucket", maxCosDist = 0.1)
      .select("id_a", "id_b", "neg_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.map(t => (t._1, t._2)).contains((0L, 1L)))
    out.foreach { case (a, b, n) =>
      assert(n != a && n != b)
      assert(rows.map(_._1).contains(n))
    }
    // determinism: same input, same triplets
    val again = ContrastiveMining
      .mineTriplets(df, "vec_id", "embedding", "bucket", maxCosDist = 0.1)
      .select("id_a", "id_b", "neg_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.sorted == again.sorted)
  }
}
