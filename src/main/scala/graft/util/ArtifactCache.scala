package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** JVM-wide cache for the SMALL driver-side blobs every index search
  * re-derives from its artifact (coarse centroids, PQ codebooks —
  * nlists×dim or subvectors×clusters×subDim floats): re-reading the
  * parquet per query costs a Spark job each time on the serving path,
  * the `ambeginscan` load-and-cache rationale [[graft.ann.GraphCache]]
  * applies to executors (reference scan.c:24-162). Keyed by the
  * directory's per-file (name, length, mtime) fingerprint so any
  * rewrite — consolidate, recluster, rebuild — invalidates; bounded by
  * a clear-on-overflow because entries are a few KB and live artifacts
  * per JVM are few (stale generations churn keys, they don't grow the
  * live set).
  */
object ArtifactCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  def cached[T <: AnyRef](spark: SparkSession, dir: String)(load: => T): T = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key = fs.makeQualified(p).toString + "#" +
      fs.listStatus(p).filter(_.isFile)
        .map(st =>
          s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .sorted.mkString(",")
    if (cache.size > 256) cache.clear()
    cache.computeIfAbsent(key, _ => load).asInstanceOf[T]
  }
}
