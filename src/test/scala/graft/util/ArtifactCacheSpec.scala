package graft.util

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[ArtifactCache]] — the serving-path blob cache: hit on identical
  * fingerprints, recompute on any rewrite, bounded as an LRU that
  * keeps the hot set under churn. */
class ArtifactCacheSpec extends SparkTestBase {

  private def dir(): String =
    java.nio.file.Files.createTempDirectory("graft-ac").toString

  private def putFile(d: String, name: String, bytes: Int): Unit = {
    val p = java.nio.file.Paths.get(d, name)
    java.nio.file.Files.write(p, Array.fill[Byte](bytes)(7))
    ()
  }

  test("hits on an unchanged dir; any rewrite changes the key") {
    val d = dir()
    putFile(d, "part-0", 16)
    var loads = 0
    def get(): String =
      ArtifactCache.cached(spark, d) { loads += 1; s"v$loads" }
    assert(get() == "v1" && get() == "v1" && loads == 1)
    // a rewrite (same name, different length) must recompute
    putFile(d, "part-0", 32)
    assert(get() == "v2" && loads == 2)
    // a new file alongside must recompute too
    putFile(d, "part-1", 8)
    assert(get() == "v3" && loads == 3)
  }

  test("LRU bound: churn evicts the coldest entries, a hot key survives") {
    val hot = dir()
    putFile(hot, "part-0", 16)
    var hotLoads = 0
    def getHot(): String =
      ArtifactCache.cached(spark, hot) { hotLoads += 1; "hot" }
    assert(getHot() == "hot" && hotLoads == 1)
    // churn well past the bound, touching the hot key as a real
    // serving path would between other tenants' loads
    val churn = dir()
    (0 until 300).foreach { i =>
      putFile(churn, "part-0", 8 + i) // new fingerprint every round
      ArtifactCache.cached(spark, churn) { s"cold$i" }
      if (i % 16 == 0) assert(getHot() == "hot")
    }
    assert(ArtifactCache.entryCount <= 256,
      s"bound exceeded: ${ArtifactCache.entryCount}")
    // the hot entry never reloaded: access order kept it resident
    // through 300 evict-inducing inserts (clear-on-overflow would have
    // dropped it ~every 256 inserts)
    assert(getHot() == "hot" && hotLoads == 1)
  }

  test("a real rewrite invalidates through the serving path: rebuilt " +
      "centroids are re-read, not served stale") {
    import spark.implicits._
    val toks = (0 until 32).flatMap { d =>
      (0 until 2).map(t =>
        (d.toLong, t, Seq.fill(8)((d * 2 + t) / 64.0f)))
    }.toDF("mdoc", "t_idx", "tok")
      .withColumn("tok", col("tok").cast("array<float>"))
    val idx = dir() + "/idx"
    graft.ops.MultiVec.writeIndex(toks, idx, nlists = 4)
    assert(graft.ops.MultiVec.loadCentroids(spark, idx).length == 4)
    // REBUILD with a different geometry: the centroids parquet is
    // rewritten, the fingerprint changes, the cache must miss
    graft.ops.MultiVec.writeIndex(toks, idx, nlists = 8)
    assert(graft.ops.MultiVec.loadCentroids(spark, idx).length == 8,
      "a rebuilt artifact must not serve the previous generation's " +
        "centroids from the cache")
  }
}
