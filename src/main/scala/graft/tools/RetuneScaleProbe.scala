package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.Retune
import graft.plans.AnnCatalog
import graft.queries.AnnQueries

/** The operational follow-up to [[ScaleProbe]]: that probe found the
  * FILTERED forms of the compact-code kinds (bq ef=384, ivfpq ef=256,
  * pq-cos ef=256) drop below the 0.8 recall floor at 10× rows and
  * recover under a manually-set `spark.graft.ann.ef` GUC. This probe
  * proves the recovery is ONE operation with [[graft.ann.Retune]]: the
  * same 10× derived table, the same artifacts (fingerprint-cached from
  * the gate builds), the gates' own registered budgets and filter
  * predicate (`vec_id % 3 = 0`) — `retune` must (a) measure the stale
  * budget as under-serving through the planner's filtered rewrite,
  * (b) pick a wider knob meeting the floor, (c) re-register it, after
  * which the registration serves at 10× with no GUC and no rebuild.
  *
  * Usage: runMain graft.tools.RetuneScaleProbe [srcSfDir] [outDir] [copies]
  */
object RetuneScaleProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft-sf1probe")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    // "adversarial" switches to the mixture-novel-points derivation
    // (DeriveScale.ensureAdversarial) — recall gets HARDER with scale
    // instead of easier, the honest version of this probe
    val adversarial = args.lift(3).contains("adversarial")
    val maxWiden = args.lift(4).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows =
      if (adversarial) DeriveScale.ensureAdversarial(
        spark, srcDir, outDir, copies, cpus.toInt)
      else DeriveScale.ensure(spark, srcDir, outDir, copies, cpus.toInt)
    println(s"[retune-probe] derived table: $rows rows at $outDir")
    val e = spark.read.parquet(s"$outDir/embeddings.parquet")
    val tablePath = s"$outDir/embeddings.parquet"
    val target = 0.8
    val pred = col("vec_id") % 3 === 0 // the filtered gates' predicate

    // The three kinds the 10× probe flagged, at the gates' registered
    // budgets, over the SAME artifacts the gate runs built (identical
    // tags + fingerprint cache ⇒ reuse, no rebuild here either).
    def bq(): AnnCatalog.IndexMeta = {
      val path = AnnQueries.artifactDir("bqp", outDir, "embeddings")
      AnnQueries.cached(path) {
        graft.ann.BqIndex.build(e, "vec_id", "embedding", path)
      }
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq",
        ef = 384, kind = "bq")
    }
    def ivfpq(): AnnCatalog.IndexMeta = {
      val path = AnnQueries.artifactDir("ivfpq", outDir, "embeddings")
      AnnQueries.cached(path) {
        graft.ann.IvfPqIndex.build(e, "vec_id", "embedding", path,
          nlists = 16, subvectors = 8, clusters = 64)
      }
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq",
        ef = 256, kind = "ivfpq", nprobe = 8)
    }
    def pqCos(): AnnCatalog.IndexMeta = {
      val path = AnnQueries.artifactDir("pqanncos", outDir, "embeddings")
      AnnQueries.cached(path) {
        import org.apache.spark.sql.graftshim.GraftSqlShim
        val unit = e.select(col("vec_id"),
          GraftSqlShim.column(graft.functions.UnitNormalize(
            GraftSqlShim.expression(col("embedding")))).as("embedding"))
        val cb = graft.pq.ProductQuantizer.trainCodebook(
          unit, "embedding", subvectors = 8, clusters = 64)
        graft.ann.PqAnnIndex.build(e, "vec_id", "embedding", path, cb,
          graft.ann.AnnParams(m = 16, efConstruction = 128, ef = 128,
            metric = "cos", numPartitions = 4))
      }
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "cos",
        ef = 256, kind = "pq")
    }

    val cases = Seq[(String, () => AnnCatalog.IndexMeta)](
      ("bq", bq _), ("ivfpq", ivfpq _), ("pq-cos", pqCos _))
    val results = cases.map { case (label, mk) =>
      val t0 = System.nanoTime()
      val meta = mk()
      AnnCatalog.register(spark, tablePath, meta)
      val r = try {
        Retune.retune(spark, tablePath, "embedding", meta.metric,
          k = 10, queryCount = 8, targetRecall = target, maxWiden = maxWiden,
          predicate = Some(pred))
      } finally AnnCatalog.unregister(spark, tablePath)
      val secs = (System.nanoTime() - t0) / 1e9
      val stale = r.steps.head
      val finalStep = r.steps.last
      println(f"[retune-probe] $label%-8s ${r.knob}%s ${r.registered}%5d " +
        f"recall ${stale.recall}%.3f -> picked ${r.picked.getOrElse(-1)}%5d " +
        f"recall ${finalStep.recall}%.3f  (${r.steps.size} steps, $secs%.1f s)")
      (label, r, secs)
    }

    println("\n| kind | stale budget | stale recall | retuned budget | recall | steps | wall (s) |")
    println("|---|---|---|---|---|---|---|")
    results.foreach { case (label, r, secs) =>
      println(f"| $label | ${r.knob}=${r.registered} | ${r.steps.head.recall}%.3f " +
        f"| ${r.picked.map(p => s"${r.knob}=$p").getOrElse("UNQUALIFIED")} " +
        f"| ${r.steps.last.recall}%.3f | ${r.steps.size} | $secs%.1f |")
    }
    val bad = results.count { case (_, r, _) => r.picked.isEmpty }
    val alreadyServed = results.count { case (_, r, _) =>
      r.steps.head.recall >= target }
    println(s"\n[retune-probe] ${results.size - bad}/${results.size} " +
      s"recovered to recall >= $target via retune " +
      s"($alreadyServed already served at the stale budget)")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
