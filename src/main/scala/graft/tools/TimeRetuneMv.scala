package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for the retune_multivec gate — prints
  * wall per phase so the gate's bench share can be trimmed where the
  * time actually goes. Not part of the verified surface. */
object TimeRetuneMv {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("time-retune-mv").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ann.Retune
    import graft.ops.MultiVec
    import graft.plans.AnnCatalog
    import graft.queries.AnnQueries

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[time] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val K = 10
    val target = 0.8
    val e = graft.Tables.embeddings(spark, dir)
    val t = timed("toks") {
      MultiVec.tokens(e, "vec_id", "embedding", 4)
    }
    val corpus = t.where(col("mdoc") >= 8)
    val idxPath = AnnQueries.artifactDir("mvpidx", dir, "embeddings")
    AnnQueries.cached(idxPath) {
      MultiVec.writeIndex(corpus, s"$idxPath/idx", 64)
    }
    val docsPath = AnnQueries.artifactDir("mvdocs", dir, "embeddings")
    AnnQueries.cached(docsPath) {
      MultiVec.docArrays(corpus).write.mode("overwrite")
        .parquet(s"$docsPath/docs")
    }
    val tbl = s"$docsPath/docs"
    AnnCatalog.register(spark, tbl, AnnCatalog.IndexMeta(s"$idxPath/idx",
      "mdoc", "toks", "maxsim", ef = 4 * K, kind = "multivec", nprobe = 4))
    try {
      // one serving query, job-by-job
      val docs = spark.read.parquet(tbl)
      val qm = docs.orderBy(col("mdoc")).limit(1)
        .collect().head.getSeq[scala.collection.Seq[Float]](1)
        .map(_.toArray).toArray
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      (1 to 3).foreach { i =>
        jobs.set(0)
        timed(s"one-query-$i") {
          docs.orderBy(graft.ops.MultiVec.maxsimCol(col("toks"), qm).desc,
              col("mdoc")).limit(K)
            .select(col("mdoc")).collect()
        }
        println(s"[time] one-query-$i jobs: ${jobs.get()}")
      }
      spark.sparkContext.removeSparkListener(listener)
      val r = timed("sweep") {
        Retune.retuneMultivec(spark, tbl, "toks", k = K,
          queryCount = 5, targetRecall = target, maxWiden = 64)
      }
      println(s"[time] sweep steps: " + r.steps.map(s =>
        f"${s.value} r=${s.recall}%.2f ${s.avgSearchMs}%.0fms").mkString(", "))
      val after = timed("confirm") {
        Retune.retuneMultivec(spark, tbl, "toks", k = K,
          queryCount = 5, targetRecall = target, maxWiden = 1)
      }
      println(s"[time] confirm steps: " + after.steps.map(s =>
        f"${s.value} r=${s.recall}%.2f ${s.avgSearchMs}%.0fms").mkString(", "))
      val filtered = timed("filtered") {
        Retune.retuneMultivec(spark, tbl, "toks", k = K,
          queryCount = 5, targetRecall = target, maxWiden = 8,
          predicate = Some(col("mdoc") % 3 === 1))
      }
      println(s"[time] filtered steps: " + filtered.steps.map(s =>
        f"${s.value} r=${s.recall}%.2f ${s.avgSearchMs}%.0fms").mkString(", "))
    } finally AnnCatalog.unregister(spark, tbl)
    spark.stop()
  }
}
