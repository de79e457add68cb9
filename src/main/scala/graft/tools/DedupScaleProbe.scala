package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scale probe for the DEDUP family — the pipeline analog of the
  * planner-budget ScaleProbe: derive a `copies`× documents corpus with
  * PLANTED duplicate structure, run the real operators against it, and
  * self-check the semantics (no external oracle needed, the plants ARE
  * the truth):
  *
  *  - exact dedup: copies are VERBATIM (same text, shifted doc_id) —
  *    `exactDedup` must keep exactly one row per distinct base text,
  *    and each keeper must be the minimum id of its text group.
  *  - minhash keepers: copies append one copy-specific token (Jaccard
  *    ≈ T/(T+1) per pair, far above the 0.8 threshold for real docs) —
  *    every replica set must collapse to ONE keeper. Base docs that
  *    are near-dups of each other may legitimately merge groups, so
  *    the check is within-group collapse, not group count.
  *
  * Both checks run the operator's genuine scale path (banded LSH +
  * star rounds + chunked verify under forced regime where flagged),
  * so PASS = the dedup semantics survive `copies`× rows, not merely
  * "it didn't crash".
  *
  * Usage: runMain graft.tools.DedupScaleProbe [srcSfDir] [copies] [forceScaleRegime]
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val forceScale = args.lift(2).exists(_.toBoolean)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    if (forceScale)
      spark.conf.set(graft.GraftConf.DedupBroadcastBytes, "0")

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .select($"doc_id", $"text")
    val n = docs.count()
    val idOffset = 1L << 24

    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dedup-probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    // ---------------- exact dedup over verbatim copies ----------------
    val verbatim = (0 until copies).map { c =>
      docs.withColumn("doc_id", $"doc_id" + lit(c.toLong * idOffset))
    }.reduce(_ unionAll _)
    val distinctTexts = docs.select($"text").distinct().count()
    val kept = timed(s"exactDedup ${copies}x") {
      Dedup.exactDedup(verbatim, "doc_id", Seq("text")).persist()
    }
    val keptN = kept.count()
    // every keeper must be the min id of its text group; with copy 0
    // verbatim and ids only shifted UP, that min lives in copy 0
    val badKeeper = kept.where($"doc_id" >= idOffset).count()
    kept.unpersist()
    val exactOk = keptN == distinctTexts && badKeeper == 0
    println(s"[dedup-probe] exact: kept=$keptN expected=$distinctTexts " +
      s"nonBaseKeepers=$badKeeper → ${if (exactOk) "PASS" else "FAIL"}")

    // ------------- minhash keepers over planted near-dups -------------
    // one appended copy-specific token: every base↔copy and copy↔copy
    // pair shares all base tokens (Jaccard ≈ T/(T+1) ≥ 0.8 for any doc
    // with ≥ 4 distinct tokens — report shorter docs separately)
    val nearDup = (0 until copies).map { c =>
      if (c == 0) docs
      else docs
        .withColumn("doc_id", $"doc_id" + lit(c.toLong * idOffset))
        .withColumn("text", concat($"text", lit(s" zqzprobe$c")))
    }.reduce(_ unionAll _)
      .select($"doc_id", graft.functions.tokenize($"text").as("toks"))

    val keepers = timed(s"minhashKeepers ${copies}x") {
      Dedup.minhashDedupKeepers(nearDup, "doc_id", "toks", 0.8).persist()
    }
    val mapped = keepers.count()
    // within-group collapse: replicas of one base doc share a keeper
    val groups = keepers
      .withColumn("base", $"id" % idOffset)
      .groupBy($"base")
      .agg(countDistinct($"keeper_id").as("kpg"), count(lit(1)).as("members"))
      .persist()
    val total = groups.count()
    val collapsed = groups.where($"kpg" === 1).count()
    val worst = groups.agg(max($"kpg")).head().getLong(0)
    val fullyMapped = mapped == n * copies
    // docs under 4 distinct tokens can't clear 0.8 with an added token
    val shortDocs = nearDup.where($"doc_id" < idOffset)
      .where(size(array_distinct($"toks")) < lit(4)).count()
    keepers.unpersist(); groups.unpersist()
    val frac = collapsed.toDouble / total
    val bar = 1.0 - (shortDocs.toDouble / total) - 0.02
    val minhashOk = fullyMapped && frac >= bar
    println(f"[dedup-probe] minhash: groups=$total collapsed=$collapsed " +
      f"(${frac * 100}%.1f%%, bar ${bar * 100}%.1f%%) worstKeepersPerGroup=$worst " +
      f"shortDocs=$shortDocs allMapped=$fullyMapped → " +
      (if (minhashOk) "PASS" else "FAIL"))

    spark.stop()
    if (!(exactOk && minhashOk)) sys.exit(1)
  }
}
