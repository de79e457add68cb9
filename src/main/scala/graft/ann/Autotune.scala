package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.VectorSearch

/** Index parameter autotuning — `lantern-cli autotune-index`
  * (lantern_cli/src/index_autotune/mod.rs:280-526): sample query
  * vectors, compute exact ground truth (:188-218), build one index per
  * grid variant (:328-358), measure recall@k / search latency / build
  * time (:220-254), and pick the cheapest variant meeting the target
  * recall (:161-186).
  *
  * The grid is the reference's own six (m, ef_construction, ef)
  * variants, ordered cheapest-first. Ground truth is the exact top-k
  * (TakeOrderedAndProject — the same oracle path every ANN test uses).
  */
object Autotune {

  case class Variant(m: Int, efConstruction: Int, ef: Int)

  /** index_autotune/mod.rs:328-358. */
  val DefaultGrid: Seq[Variant] = Seq(
    Variant(6, 32, 64), Variant(8, 40, 64), Variant(12, 48, 64),
    Variant(16, 60, 76), Variant(32, 96, 96), Variant(48, 128, 128))

  case class Result(
      variant: Variant,
      recall: Double,
      avgSearchMs: Double,
      buildSecs: Double)

  case class Report(results: Seq[Result], picked: Option[Result])

  def autotune(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      metric: String = "l2sq",
      k: Int = 10,
      queryCount: Int = 10,
      targetRecall: Double = 0.9,
      grid: Seq[Variant] = DefaultGrid,
      numPartitions: Int = 2,
      workDir: String = null): Report = {
    val spark = df.sparkSession
    val ownsWorkDir = workDir == null
    val base = Option(workDir).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-autotune").toString)

    // sampled queries + exact ground truth (mod.rs:188-218)
    val queries = graft.util.Sampling
      .hashSample(df.select(col(idCol).cast("long").as(idCol), col(vecCol)),
        queryCount, col(idCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(queries.nonEmpty, "graft: autotune needs at least one sample row")
    val truth = queries.map { case (_, q) =>
      VectorSearch.exact(df, col(vecCol), q, k, metric,
        tieBreak = Seq(col(idCol)))
        .select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSet
    }

    val results = grid.map { v =>
      val path = s"$base/idx-m${v.m}-efc${v.efConstruction}-ef${v.ef}"
      val t0 = System.nanoTime()
      AnnIndex.build(df, idCol, vecCol, path,
        AnnParams(v.m, v.efConstruction, v.ef, metric, numPartitions))
      val buildSecs = (System.nanoTime() - t0) / 1e9

      var hits = 0
      var total = 0
      val t1 = System.nanoTime()
      queries.zip(truth).foreach { case ((_, q), expected) =>
        val got = AnnIndex.search(spark, path, q, k, v.ef).map(_._1).toSet
        hits += got.intersect(expected).size
        total += expected.size
      }
      val avgMs = (System.nanoTime() - t1) / 1e6 / queries.length
      Result(v, hits.toDouble / total, avgMs, buildSecs)
    }

    // trial artifacts are dead weight once measured — a tuning sweep
    // over a big table would otherwise leave 6 full index copies in tmp
    if (ownsWorkDir) {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }

    // grid is cost-ordered: first variant meeting the target wins
    Report(results, results.find(_.recall >= targetRecall))
  }

  /** Autotune AND create the winning index at `indexPath` — the
    * reference's create-best step (index_autotune/mod.rs:161-186, where
    * the CLI can export/create the picked variant instead of just
    * reporting). The winning TRIAL artifact is promoted by rename (no
    * second build): trials run in `<indexPath>.autotune-trials` on the
    * same filesystem as the target, the picked one is moved into place,
    * the rest deleted. Throws when no variant meets `targetRecall`
    * (trials are still cleaned up).
    */
  def autotuneCreate(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      indexPath: String,
      metric: String = "l2sq",
      k: Int = 10,
      queryCount: Int = 10,
      targetRecall: Double = 0.9,
      grid: Seq[Variant] = DefaultGrid,
      numPartitions: Int = 2): Report = {
    val spark = df.sparkSession
    val trials = s"$indexPath.autotune-trials"
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val report = autotune(df, idCol, vecCol, metric, k, queryCount,
        targetRecall, grid, numPartitions, workDir = trials)
      val picked = report.picked.getOrElse(throw new IllegalStateException(
        s"graft: no autotune variant reached recall $targetRecall " +
          s"(best: ${report.results.map(_.recall).max})"))
      val v = picked.variant
      val target = new org.apache.hadoop.fs.Path(indexPath)
      val won = new org.apache.hadoop.fs.Path(
        s"$trials/idx-m${v.m}-efc${v.efConstruction}-ef${v.ef}")
      // winner must exist BEFORE the old index is deleted
      require(fs.exists(won), s"graft: winning trial $won missing")
      if (fs.exists(target)) fs.delete(target, true)
      require(fs.rename(won, target),
        s"graft: failed to promote $won to $target")
      report
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(trials), true)
      ()
    }
  }

  /** Report as a DataFrame (the reference prints a table; jobs persist it). */
  def reportDf(spark: SparkSession, report: Report): DataFrame = {
    import spark.implicits._
    report.results
      .map(r => (r.variant.m, r.variant.efConstruction, r.variant.ef,
        r.recall, r.avgSearchMs, r.buildSecs,
        report.picked.contains(r)))
      .toDF("m", "ef_construction", "ef", "recall", "avg_search_ms",
        "build_secs", "picked")
  }

  // --------------------------------------------------------------- IVF

  case class IvfVariant(nlists: Int, nprobe: Int)
  case class IvfResult(variant: IvfVariant, recall: Double,
      avgSearchMs: Double, buildSecs: Double)
  case class IvfReport(results: Seq[IvfResult], picked: Option[IvfResult])

  /** Same protocol for the IVF family: one index per nlists value,
    * every nprobe measured against it (probing is a search-time knob,
    * so variants sharing nlists share the build). Grid is ordered by
    * probe fraction ascending = cheapest first.
    */
  def autotuneIvf(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      queryCount: Int = 10,
      targetRecall: Double = 0.9,
      grid: Seq[IvfVariant] = Seq(
        IvfVariant(16, 1), IvfVariant(16, 2), IvfVariant(8, 1),
        IvfVariant(16, 4), IvfVariant(8, 2), IvfVariant(8, 4)),
      workDir: String = null): IvfReport = {
    val spark = df.sparkSession
    val ownsWorkDir = workDir == null
    val base = Option(workDir).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-ivftune").toString)
    val queries = graft.util.Sampling
      .hashSample(df.select(col(idCol).cast("long").as(idCol), col(vecCol)),
        queryCount, col(idCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(queries.nonEmpty, "graft: autotune needs at least one sample row")
    val truth = queries.map { case (_, q) =>
      VectorSearch.exact(df, col(vecCol), q, k, "l2sq",
        tieBreak = Seq(col(idCol)))
        .select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSet
    }

    val buildTimes = scala.collection.mutable.Map[Int, Double]()
    grid.map(_.nlists).distinct.foreach { nlists =>
      val t0 = System.nanoTime()
      IvfIndex.build(df, idCol, vecCol, s"$base/ivf-$nlists", nlists)
      buildTimes(nlists) = (System.nanoTime() - t0) / 1e9
    }
    val results = grid.sortBy(v => v.nprobe.toDouble / v.nlists).map { v =>
      var hits = 0; var total = 0
      val t1 = System.nanoTime()
      queries.zip(truth).foreach { case ((_, q), expected) =>
        val got = IvfIndex.search(spark, s"$base/ivf-${v.nlists}", q, k, v.nprobe)
          .select("id").collect().map(_.getLong(0)).toSet
        hits += got.intersect(expected).size
        total += expected.size
      }
      val avgMs = (System.nanoTime() - t1) / 1e6 / queries.length
      IvfResult(v, hits.toDouble / total, avgMs, buildTimes(v.nlists))
    }
    if (ownsWorkDir) {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
    IvfReport(results, results.find(_.recall >= targetRecall))
  }

  /** Autotune AND create the winning IVF index at `indexPath` — the
    * IVF counterpart of [[autotuneCreate]]. The winning trial's list
    * layout is promoted by rename (one build per distinct nlists, no
    * rebuild); the picked `nprobe` is in the returned report's `pick`
    * — register it in `AnnCatalog.IndexMeta(nprobe = ...)` for planner
    * routing. Throws when no variant meets `targetRecall` (trials are
    * still cleaned up). */
  def autotuneIvfCreate(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      indexPath: String,
      k: Int = 10,
      queryCount: Int = 10,
      targetRecall: Double = 0.9,
      grid: Seq[IvfVariant] = Seq(
        IvfVariant(16, 1), IvfVariant(16, 2), IvfVariant(8, 1),
        IvfVariant(16, 4), IvfVariant(8, 2), IvfVariant(8, 4))): IvfReport = {
    val spark = df.sparkSession
    val trials = indexPath + ".autotune-trials"
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val report = autotuneIvf(df, idCol, vecCol, k, queryCount,
        targetRecall, grid, workDir = trials)
      val pick = report.picked.getOrElse(throw new IllegalStateException(
        s"graft: no IVF variant reached recall >= $targetRecall"))
      val target = new org.apache.hadoop.fs.Path(indexPath)
      val won = new org.apache.hadoop.fs.Path(s"$trials/ivf-${pick.variant.nlists}")
      // verify the winner exists BEFORE deleting any existing index, and
      // require the rename's result — a silent false here would destroy
      // the old index and return a report pointing at nothing
      require(fs.exists(won), s"graft: winning trial $won missing")
      if (fs.exists(target)) fs.delete(target, true)
      require(fs.rename(won, target),
        s"graft: failed to promote $won to $target")
      report
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(trials), true)
      ()
    }
  }

  /** IVF report as a DataFrame (same persistence shape as [[reportDf]]). */
  def ivfReportDf(spark: SparkSession, report: IvfReport): DataFrame = {
    import spark.implicits._
    report.results
      .map(r => (r.variant.nlists, r.variant.nprobe, r.recall,
        r.avgSearchMs, r.buildSecs, report.picked.contains(r)))
      .toDF("nlists", "nprobe", "recall", "avg_search_ms", "build_secs",
        "picked")
  }

  // ------------------------------------------------------------- IVF-PQ

  case class IvfPqVariant(nprobe: Int, ef: Int)
  case class IvfPqResult(variant: IvfPqVariant, recall: Double,
      avgSearchMs: Double)
  case class IvfPqReport(buildSecs: Double, results: Seq[IvfPqResult],
      picked: Option[IvfPqResult])

  /** Default (nprobe, rescore ef) sweep, cheapest-first: nprobe scales
    * the probed-list code I/O, ef the exact float rerank. */
  val DefaultIvfPqGrid: Seq[IvfPqVariant] = Seq(
    IvfPqVariant(2, 64), IvfPqVariant(2, 256), IvfPqVariant(4, 64),
    IvfPqVariant(4, 256), IvfPqVariant(8, 64), IvfPqVariant(8, 256))

  /** `autotune-index` protocol for IVF-PQ's two serving knobs
    * (reference grid semantics index_autotune/mod.rs:328-358): the
    * index is built ONCE (nlists/subvectors/clusters are build
    * parameters, not serving knobs), every (nprobe, ef) variant is
    * measured with one batched [[IvfPqIndex.searchMany]] pass under
    * the exact float rerank, picked = the FIRST grid variant meeting
    * the target. At fixed nprobe, recall is non-decreasing in ef by
    * construction (nested LUT pools under an exact rerank); across
    * nprobe values the candidate sets are not nested, so no cross-
    * probe ordering is promised. */
  def autotuneIvfPq(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      queryCount: Int = 10,
      targetRecall: Double = 0.9,
      grid: Seq[IvfPqVariant] = DefaultIvfPqGrid,
      nlists: Int = 16,
      subvectors: Int = 8,
      clusters: Int = 64,
      workDir: String = null): IvfPqReport = {
    val spark = df.sparkSession
    val ownsWorkDir = workDir == null
    val base = Option(workDir).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-ivfpqtune").toString)
    val queries = graft.util.Sampling
      .hashSample(df.select(col(idCol).cast("long").as(idCol), col(vecCol)),
        queryCount, col(idCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(queries.nonEmpty, "graft: autotune needs at least one sample row")
    val truth = queries.map { case (_, q) =>
      VectorSearch.exact(df, col(vecCol), q, k, "l2sq",
        tieBreak = Seq(col(idCol)))
        .select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSet
    }

    val path = s"$base/ivfpq"
    val t0 = System.nanoTime()
    IvfPqIndex.build(df, idCol, vecCol, path, nlists = nlists,
      subvectors = subvectors, clusters = clusters)
    val buildSecs = (System.nanoTime() - t0) / 1e9
    val vecs = df.select(col(idCol).cast("long").as(idCol), col(vecCol))

    val results = grid.map { v =>
      val t1 = System.nanoTime()
      val got = IvfPqIndex.searchMany(spark, path, queries.toSeq, k,
          nprobe = v.nprobe, ef = v.ef, rerank = Some((vecs, idCol, vecCol)))
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
      val avgMs = (System.nanoTime() - t1) / 1e6 / queries.length
      var hits = 0; var total = 0
      queries.zip(truth).foreach { case ((qid, _), expected) =>
        hits += got.getOrElse(qid, Set.empty).intersect(expected).size
        total += expected.size
      }
      IvfPqResult(v, hits.toDouble / total, avgMs)
    }
    if (ownsWorkDir) {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
    IvfPqReport(buildSecs, results, results.find(_.recall >= targetRecall))
  }

  /** IVF-PQ report as a DataFrame (same persistence shape). */
  def ivfPqReportDf(spark: SparkSession, report: IvfPqReport): DataFrame = {
    import spark.implicits._
    report.results
      .map(r => (r.variant.nprobe, r.variant.ef, r.recall, r.avgSearchMs,
        report.buildSecs, report.picked.contains(r)))
      .toDF("nprobe", "ef", "recall", "avg_search_ms", "build_secs",
        "picked")
  }

  // ---------------------------------------------------------------- BQ

  case class BqResult(pool: Int, recall: Double, avgSearchMs: Double)
  case class BqReport(buildSecs: Double, results: Seq[BqResult],
      picked: Option[BqResult])

  /** Same protocol for the binary-quantization rescore path: the bits
    * artifact is built ONCE (the signatures are parameter-free), and
    * `pool` — the rescore width, the knob `kind = "bq"` registrations
    * expose as `ef` — is swept ascending (pool IS the cost: stage-2
    * distance work and float-row fetches scale linearly with it).
    * Every pool is measured with ONE batched
    * [[graft.ops.BqSearch.topKManyPrepacked]] pass over all sample
    * queries; picked = the smallest pool meeting the target recall.
    * Register the winner as `IndexMeta(ef = picked.pool, kind = "bq")`.
    */
  def autotuneBq(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      queryCount: Int = 10,
      targetRecall: Double = 0.9,
      pools: Seq[Int] = Seq(64, 128, 256, 512, 1024),
      metric: String = "l2sq",
      workDir: String = null): BqReport = {
    val spark = df.sparkSession
    val ownsWorkDir = workDir == null
    val base = Option(workDir).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-bqtune").toString)
    val queries = graft.util.Sampling
      .hashSample(df.select(col(idCol).cast("long").as(idCol), col(vecCol)),
        queryCount, col(idCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(queries.nonEmpty, "graft: autotune needs at least one sample row")
    val truth = queries.map { case (_, q) =>
      VectorSearch.exact(df, col(vecCol), q, k, metric,
        tieBreak = Seq(col(idCol)))
        .select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSet
    }

    val path = s"$base/bq"
    val t0 = System.nanoTime()
    BqIndex.build(df, idCol, vecCol, path)
    val buildSecs = (System.nanoTime() - t0) / 1e9
    val bits = BqIndex.liveBits(spark, path)
    val c = BqIndex.center(spark, path)
    val vecs = df.select(col(idCol).cast("long").as("id"), col(vecCol))

    val results = pools.sorted.map { pool =>
      val t1 = System.nanoTime()
      val got = graft.ops.BqSearch.topKManyPrepacked(
          bits, "id", "bits", vecs, vecCol, queries.toSeq, k, pool,
          metric, c)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
      val avgMs = (System.nanoTime() - t1) / 1e6 / queries.length
      var hits = 0; var total = 0
      queries.zip(truth).foreach { case ((qid, _), expected) =>
        hits += got.getOrElse(qid, Set.empty).intersect(expected).size
        total += expected.size
      }
      BqResult(pool, hits.toDouble / total, avgMs)
    }
    if (ownsWorkDir) {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
    BqReport(buildSecs, results, results.find(_.recall >= targetRecall))
  }

  /** BQ report as a DataFrame (same persistence shape as [[reportDf]]). */
  def bqReportDf(spark: SparkSession, report: BqReport): DataFrame = {
    import spark.implicits._
    report.results
      .map(r => (r.pool, r.recall, r.avgSearchMs, report.buildSecs,
        report.picked.contains(r)))
      .toDF("pool", "recall", "avg_search_ms", "build_secs", "picked")
  }

  // ------------------------------------------------- in-graph PQ (pq)

  case class PqResult(ef: Int, recall: Double, avgSearchMs: Double)
  case class PqReport(buildSecs: Double, results: Seq[PqResult],
      picked: Option[PqResult])

  /** The `autotune-index` protocol for the in-graph PQ kind
    * (reference grid semantics index_autotune/mod.rs:328-358 applied
    * to the pq serving knob): codebook + graph built ONCE, `ef` — the
    * LUT-walk beam width a `kind = "pq"` registration exposes — swept
    * ascending under the EXACT float rerank. Unlike the bq/mrl pools
    * (nested prefixes of one ranking), a graph walk at a larger ef is
    * not a superset of a smaller one, so the report records whatever
    * recall each beam measures and the pick is simply the first
    * variant meeting the target; monotonicity is NOT promised. */
  def autotunePq(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      queryCount: Int = 10,
      targetRecall: Double = 0.9,
      efs: Seq[Int] = Seq(16, 32, 64, 128, 256, 400),
      subvectors: Int = 8,
      clusters: Int = 64,
      metric: String = "l2sq",
      workDir: String = null): PqReport = {
    val spark = df.sparkSession
    val ownsWorkDir = workDir == null
    val base = Option(workDir).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-pqtune").toString)
    val queries = graft.util.Sampling
      .hashSample(df.select(col(idCol).cast("long").as(idCol), col(vecCol)),
        queryCount, col(idCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(queries.nonEmpty, "graft: autotune needs at least one sample row")
    val truth = queries.map { case (_, q) =>
      VectorSearch.exact(df, col(vecCol), q, k, metric,
        tieBreak = Seq(col(idCol)))
        .select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSet
    }

    val path = s"$base/pq"
    val t0 = System.nanoTime()
    val cb = graft.pq.ProductQuantizer.trainCodebook(
      df, vecCol, clusters = clusters, subvectors = subvectors)
    PqAnnIndex.build(df, idCol, vecCol, path, cb,
      AnnParams(m = 16, efConstruction = 128, ef = efs.max,
        numPartitions = 4, metric = metric))
    val buildSecs = (System.nanoTime() - t0) / 1e9

    val results = efs.sorted.map { ef =>
      val t1 = System.nanoTime()
      val got = PqAnnIndex.searchMany(spark, path, queries.toSeq, k,
          ef = ef, rerank = Some((df, idCol, vecCol)), metric = metric)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
      val avgMs = (System.nanoTime() - t1) / 1e6 / queries.length
      var hits = 0; var total = 0
      queries.zip(truth).foreach { case ((qid, _), expected) =>
        hits += got.getOrElse(qid, Set.empty).intersect(expected).size
        total += expected.size
      }
      PqResult(ef, hits.toDouble / total, avgMs)
    }
    if (ownsWorkDir) {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
    PqReport(buildSecs, results, results.find(_.recall >= targetRecall))
  }

  /** PQ report as a DataFrame (same persistence shape as [[reportDf]]). */
  def pqReportDf(spark: SparkSession, report: PqReport): DataFrame = {
    import spark.implicits._
    report.results
      .map(r => (r.ef, r.recall, r.avgSearchMs, report.buildSecs,
        report.picked.contains(r)))
      .toDF("ef", "recall", "avg_search_ms", "build_secs", "picked")
  }

  // --------------------------------------------------- matryoshka (MRL)

  case class MrlVariant(m: Int, pool: Int)
  case class MrlResult(variant: MrlVariant, recall: Double,
      avgSearchMs: Double)
  case class MrlReport(results: Seq[MrlResult], picked: Option[MrlResult])

  /** Default (prefix dim, rescore pool) sweep, cheapest-first: `m`
    * scales stage-1 scan bytes and distance arithmetic, `pool` the
    * exact full-dimension rerank. */
  val DefaultMrlGrid: Seq[MrlVariant] = Seq(
    MrlVariant(8, 64), MrlVariant(8, 256), MrlVariant(16, 64),
    MrlVariant(16, 256), MrlVariant(32, 64), MrlVariant(32, 256))

  /** `autotune-index` protocol for the matryoshka two-stage search
    * ([[graft.ops.MrlSearch]]): sample a query set, compute the exact
    * truth once, measure every (m, pool) variant with one batched
    * [[graft.ops.MrlSearch.topKMany]] pass each (zero index build —
    * the "index" is a column slice, so the sweep's only cost is the
    * searches), pick the FIRST grid variant meeting the target. At
    * fixed m, recall is non-decreasing in pool by construction (nested
    * candidate pools under an exact rerank). */
  def autotuneMrl(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      queryCount: Int = 10,
      targetRecall: Double = 0.9,
      grid: Seq[MrlVariant] = DefaultMrlGrid,
      metric: String = "l2sq"): MrlReport = {
    val queries = graft.util.Sampling
      .hashSample(df.select(col(idCol).cast("long").as(idCol), col(vecCol)),
        queryCount, col(idCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(queries.nonEmpty, "graft: autotune needs at least one sample row")
    val truth = queries.map { case (_, q) =>
      VectorSearch.exact(df, col(vecCol), q, k, metric,
        tieBreak = Seq(col(idCol)))
        .select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSet
    }
    val results = grid.map { v =>
      val t1 = System.nanoTime()
      val got = graft.ops.MrlSearch.topKMany(
          df, idCol, vecCol, queries.toSeq, k, pool = v.pool, m = v.m,
          metric = metric)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
      val avgMs = (System.nanoTime() - t1) / 1e6 / queries.length
      var hits = 0; var total = 0
      queries.zip(truth).foreach { case ((qid, _), expected) =>
        hits += got.getOrElse(qid, Set.empty).intersect(expected).size
        total += expected.size
      }
      MrlResult(v, hits.toDouble / total, avgMs)
    }
    MrlReport(results, results.find(_.recall >= targetRecall))
  }

  /** MRL report as a DataFrame (same persistence shape as the rest). */
  def mrlReportDf(spark: SparkSession, report: MrlReport): DataFrame = {
    import spark.implicits._
    report.results
      .map(r => (r.variant.m, r.variant.pool, r.recall, r.avgSearchMs,
        report.picked.contains(r)))
      .toDF("m", "pool", "recall", "avg_search_ms", "picked")
  }

  // -------------------------------------------------- multivec (PLAID)

  case class MvVariant(nprobe: Int, cand: Int)
  case class MvResult(variant: MvVariant, recall: Double, avgSearchMs: Double)
  case class MvReport(buildSecs: Double, results: Seq[MvResult],
      picked: Option[MvResult])

  /** Default (nprobe, candPerQuery) sweep, cheapest-first: nprobe
    * scales stage-1 probed-list I/O, cand scales the exact rerank. */
  val DefaultMvGrid: Seq[MvVariant] = Seq(
    MvVariant(4, 16), MvVariant(4, 64), MvVariant(8, 64),
    MvVariant(16, 16), MvVariant(16, 64))

  /** The `autotune-index` protocol applied to the PLAID serving knobs:
    * the index is built ONCE (centroids + postings are independent of
    * the swept parameters), sample query docs are answered exactly
    * (one batched [[graft.ops.MultiVec.scoreFlat]] pass) for ground
    * truth, and every (nprobe, candPerQuery) variant is measured by
    * one batched [[graft.ops.MultiVec.searchIndex]]; picked = the
    * first variant meeting the target micro-averaged recall@k. At
    * fixed nprobe, recall is non-decreasing in cand by construction
    * (nested candidate sets under an exact rerank). */
  def autotuneMultivec(
      toks: DataFrame,
      k: Int = 10,
      queryCount: Int = 5,
      targetRecall: Double = 0.9,
      grid: Seq[MvVariant] = DefaultMvGrid,
      nlists: Int = 64,
      workDir: String = null): MvReport = {
    import graft.ops.MultiVec
    val spark = toks.sparkSession
    val ownsWorkDir = workDir == null
    val base = Option(workDir).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-mvtune").toString)

    val qDocs = graft.util.Sampling
      .hashSample(toks.select(col("mdoc")).distinct(), queryCount, col("mdoc"))
      .collect().map(_.getLong(0)).toSeq.sorted
    require(qDocs.nonEmpty, "graft: autotune needs at least one sample doc")
    val qToks = MultiVec.queryToks(toks, qDocs)

    def perQuery(df: DataFrame): Map[Long, Set[Long]] =
      df.select("q_mdoc", "mdoc").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = perQuery(
      MultiVec.topKPerQuery(MultiVec.scoreFlat(toks, qToks), k))

    val path = s"$base/mv"
    val t0 = System.nanoTime()
    MultiVec.writeIndex(toks, path, nlists)
    val buildSecs = (System.nanoTime() - t0) / 1e9

    val results = grid.map { v =>
      val t1 = System.nanoTime()
      val got = perQuery(
        MultiVec.searchIndex(spark, path, qToks, k, v.nprobe, v.cand))
      val avgMs = (System.nanoTime() - t1) / 1e6 / qDocs.length
      var hits = 0; var total = 0
      truth.foreach { case (qid, expected) =>
        hits += got.getOrElse(qid, Set.empty).intersect(expected).size
        total += expected.size
      }
      MvResult(v, hits.toDouble / total, avgMs)
    }
    if (ownsWorkDir) {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
    MvReport(buildSecs, results, results.find(_.recall >= targetRecall))
  }

  /** Multivec report as a DataFrame (same persistence shape). */
  def mvReportDf(spark: SparkSession, report: MvReport): DataFrame = {
    import spark.implicits._
    report.results
      .map(r => (r.variant.nprobe, r.variant.cand, r.recall, r.avgSearchMs,
        report.buildSecs, report.picked.contains(r)))
      .toDF("nprobe", "cand", "recall", "avg_search_ms", "build_secs", "picked")
  }
}
