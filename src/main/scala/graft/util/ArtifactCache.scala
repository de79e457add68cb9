package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** JVM-wide cache for the SMALL driver-side blobs every index search
  * re-derives from its artifact (coarse centroids, PQ codebooks —
  * nlists×dim or subvectors×clusters×subDim floats): re-reading the
  * parquet per query costs a Spark job each time on the serving path,
  * the `ambeginscan` load-and-cache rationale [[graft.ann.GraphCache]]
  * applies to executors (reference scan.c:24-162).
  *
  * Keyed by the directory's per-file (name, length, mtime) fingerprint
  * so any rewrite — consolidate, recluster, rebuild — changes the key
  * and the stale entry simply stops being hit. (Caveat: a rewrite
  * reproducing identical names AND lengths within the store's mtime
  * granularity would serve stale — none of this repo's writers can,
  * since Spark part-file names carry fresh task UUIDs.)
  *
  * Bounded as an access-ordered LRU: artifacts live on the serving
  * path of four kinds, and one tenant churning keys (stale generations
  * of a frequently-compacted index) must evict only the COLDEST
  * entries, never every live artifact's blob at once. The load itself
  * runs OUTSIDE the lock — it is a Spark job; two racers may both load
  * the same key and the first write wins, which is harmless for the
  * pure-function loads cached here.
  */
object ArtifactCache {
  private val MaxEntries = 256

  private val cache =
    new java.util.LinkedHashMap[String, AnyRef](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, AnyRef]): Boolean =
        size() > MaxEntries
    }

  private def fingerprint(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.makeQualified(p).toString + "#" +
      fs.listStatus(p).filter(_.isFile)
        .map(st =>
          s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .sorted.mkString(",")
  }

  def cached[T <: AnyRef](spark: SparkSession, dir: String)(load: => T): T = {
    val key = fingerprint(spark, dir)
    val hit = cache.synchronized(cache.get(key))
    if (hit != null) hit.asInstanceOf[T]
    else {
      val v = load
      cache.synchronized {
        val prior = cache.get(key)
        if (prior != null) prior.asInstanceOf[T]
        else { cache.put(key, v); v }
      }
    }
  }

  /** Current entry count (test introspection). */
  private[graft] def entryCount: Int = cache.synchronized(cache.size())
}
