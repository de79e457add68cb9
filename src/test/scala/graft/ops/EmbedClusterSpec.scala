package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class EmbedClusterSpec extends SparkTestBase {
  import spark.implicits._

  // two tight blobs far apart + ids arranged so init (lowest-2 ids)
  // starts with one centroid in each blob
  private def blobs = Seq(
    (0L, Array(0f, 0f)), (1L, Array(10f, 10f)),
    (2L, Array(0.1f, 0f)), (3L, Array(0f, 0.1f)),
    (4L, Array(10.1f, 10f)), (5L, Array(10f, 10.1f))
  ).toDF("vec_id", "embedding")

  test("fit converges to blob means; assign is deterministic with low-id ties") {
    val m = EmbedCluster.fit(blobs, "vec_id", "embedding", k = 2, iters = 2)
    // cluster 0 mean ≈ (0.033, 0.033), cluster 1 mean ≈ (10.033, 10.033)
    assert(math.abs(m.centroids(0)(0) - 0.033333) < 1e-6)
    assert(math.abs(m.centroids(1)(0) - 10.033333) < 1e-6)
    val a = EmbedCluster.assign(blobs, "vec_id", "embedding", m)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(Seq(0L, 2L, 3L).forall(a(_) == 0))
    assert(Seq(1L, 4L, 5L).forall(a(_) == 1))
  }

  test("empty cluster keeps its previous centroid") {
    // both init centroids sit in blob A; second centroid captures
    // nothing after the first step if all points are closer to c0…
    // construct: c1 init at an outlier that attracts nothing post-step
    val df = Seq(
      (0L, Array(0f, 0f)), (1L, Array(100f, 100f)),
      (2L, Array(0.1f, 0f)), (3L, Array(0f, 0.1f))
    ).toDF("vec_id", "embedding")
    val m = EmbedCluster.fit(df, "vec_id", "embedding", k = 2, iters = 2)
    // cluster 1 holds the single outlier both rounds
    assert(m.centroids(1).toSeq == Seq(100.0, 100.0))
  }

  test("semDedupKeepers drops higher-id near-dups within a cluster only") {
    // 2 and 0 near-identical (same cluster) → 2 dropped; 4 and 1 near
    // but in the other cluster → 4 dropped; cross-cluster similarity
    // can't drop anything by construction
    val df = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(0.999f, 0.001f)), (3L, Array(0.72f, 0.72f)),
      (4L, Array(0.001f, 0.999f))
    ).toDF("vec_id", "embedding")
    val m = EmbedCluster.fit(df, "vec_id", "embedding", k = 2, iters = 1)
    val keep = EmbedCluster
      .semDedupKeepers(df, "vec_id", "embedding", m, maxCosDist = 0.01)
      .as[Long].collect().toSet
    assert(!keep.contains(2L) && !keep.contains(4L))
    assert(keep.contains(0L) && keep.contains(1L) && keep.contains(3L))
  }
}
