package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-checkable gates for the index MUTATION lifecycles of the
  * coarse-list and PQ-graph kinds (SURVEY.md §2.2 `aminsert` /
  * `ambulkdelete` / `autotune-index` applied to ivf, ivfpq, pq — the
  * reference exercises every lifecycle op it ships:
  * lantern_hnsw/src/hnsw/insert.c:51-262, delete.c:15-73,
  * lantern_cli/src/index_autotune/mod.rs:328-358).
  *
  * The streaming-insert twins follow the `streaming_bq_insert` shape:
  * build over the lower half, stream the upper half through a genuine
  * parquet FILE source in three micro-batches into `append`, then gate
  * BOTH the codec bit-identity (via the kind's `validateIndex` — every
  * appended row must re-derive from the PERSISTED codec exactly as a
  * batch build would have filed it) and serving (multi-query recall
  * over the complete corpus with streamed rows provably surfacing).
  */
object LifecycleQueries {

  /** Shared scaffold of the streaming `aminsert` twins (the
    * `streaming_bq_insert` protocol, parameterized by the kind's
    * build/append/validate/search): build over the lower half, stream
    * the upper half through a genuine parquet FILE source in three
    * micro-batches into `append`, then gate BOTH codec bit-identity —
    * `validate(path, fullTable)` is the kind's `validateIndex`, whose
    * re-derivation proves every streamed row is filed exactly as a
    * batch build would have — and serving: mean recall@10 ≥ 0.8 over
    * the COMPLETE corpus via `search(path, queries)` (searchMany
    * output shape), with streamed-range ids surfacing wherever the
    * exact truth holds them. Fresh artifact per invocation (appends
    * mutate it — a cached one would double-append under bench reps). */
  private def streamingInsertTwin(
      s: SparkSession, dir: String, tag: String,
      build: (DataFrame, String) => Unit,
      append: (DataFrame, String) => Unit,
      validate: (String, DataFrame) => Long,
      search: (String, Seq[(Long, Array[Float])]) => DataFrame): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val path = java.nio.file.Files
      .createTempDirectory(s"graft-$tag").toString + "/idx"
    // the exact truth never touches the index artifact — overlap it
    // with the whole build + stream chain below
    val qs = e.orderBy(col("vec_id")).limit(RecallProtocol.QueryCount)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qDf = e.where(col("vec_id") <= qs.map(_._1).max)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exactF = RecallProtocol.async(
      RecallProtocol.truth(qDf, e, "vec_id", "embedding"))
    build(e.where(col("vec_id") <= maxId / 2), path)
    val base = e.where(col("vec_id") > maxId / 2)
      .select(col("vec_id"), col("embedding"))
    val lo = maxId / 2 + 1
    val width = (maxId - lo) / 3 + 1
    val chunkRoot = AnnQueries.artifactDir(s"${tag}ins", dir, "embeddings")
    val files = StreamChunks.materialize(chunkRoot,
      (0 until 3).map { c => () =>
        base.where(col("vec_id") >= lo + c * width &&
          col("vec_id") < lo + (c + 1) * width)
      })
    val (streamDir, src) = StreamChunks.source(s, base.schema)
    val q = src.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) append(b, path)
      }
      .start()
    StreamChunks.drive(q, streamDir, files)

    if (validate(path, e) != e.count()) {
      // drain the overlapped truth pass before the fail-fast return —
      // an unjoined job would bleed cluster work into the next gate's
      // timing; its own failure must not mask the empty-DF contract
      try exactF() catch { case _: Throwable => () }
      return Seq.empty[Int].toDF("ok")
    }

    val ann = RecallProtocol.perQueryDf(search(path, qs.toSeq))
    val exact = exactF()
    val annIds = ann.values.flatten.toSet
    val exactIds = exact.values.flatten.toSet
    val streamedFound = annIds.exists(_ > maxId / 2) ||
      !exactIds.exists(_ > maxId / 2)
    if (RecallProtocol.meanRecallOk(ann, exact) && streamedFound)
      Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  /** IVF twin: appends assign to the PERSISTED coarse centroids (the
    * codec fixed at build time), so the streamed artifact is
    * bit-identical to a batch append — validateIndex re-derives every
    * row's list assignment and vector, both directions. */
  private def streamingIvfInsert(s: SparkSession, dir: String): DataFrame = {
    import graft.ann.IvfIndex
    streamingInsertTwin(s, dir, "sivf",
      build = (lower, path) =>
        IvfIndex.build(lower, "vec_id", "embedding", path, nlists = 16),
      append = (b, path) => IvfIndex.append(b, "vec_id", "embedding", path),
      validate = (path, full) => IvfIndex.validateIndex(s, path,
        source = Some((full, "vec_id", "embedding"))),
      search = (path, qs) =>
        IvfIndex.searchMany(s, path, qs, k = 10, nprobe = 12))
  }

  /** IVF-PQ twin: appends encode with the PERSISTED centroids AND
    * residual codebook — validateIndex replays the shared encode pass,
    * so streamed (list_id, codes) must match bit-for-bit; serving goes
    * through the exact float rerank. */
  private def streamingIvfPqInsert(s: SparkSession, dir: String): DataFrame = {
    import graft.ann.IvfPqIndex
    val e = Tables.embeddings(s, dir)
    streamingInsertTwin(s, dir, "sivfpq",
      build = (lower, path) => IvfPqIndex.build(lower, "vec_id", "embedding",
        path, nlists = 16, subvectors = 8, clusters = 64),
      append = (b, path) => IvfPqIndex.append(b, "vec_id", "embedding", path),
      validate = (path, full) => IvfPqIndex.validateIndex(s, path,
        source = Some((full, "vec_id", "embedding"))),
      search = (path, qs) => IvfPqIndex.searchMany(s, path, qs, k = 10,
        nprobe = 12, ef = 512, rerank = Some((e, "vec_id", "embedding"))))
  }

  /** In-graph PQ twin — completes the streaming-insert matrix
    * (hnsw/bq/mrl/sparse/multivec/ivf/ivfpq/pq all have file-source
    * twins): micro-batches quantize with the PERSISTED codebook into
    * delta graph shards; validateIndex's codes re-derivation certifies
    * bit-identity, serving goes through the exact float rerank. */
  private def streamingPqInsert(s: SparkSession, dir: String): DataFrame = {
    import graft.ann.{AnnParams, PqAnnIndex}
    import graft.pq.ProductQuantizer
    val e = Tables.embeddings(s, dir)
    streamingInsertTwin(s, dir, "spq",
      build = (lower, path) => {
        val cb = ProductQuantizer.trainCodebook(
          lower, "embedding", subvectors = 8, clusters = 64)
        PqAnnIndex.build(lower, "vec_id", "embedding", path, cb,
          AnnParams(m = 16, efConstruction = 128, ef = 128,
            numPartitions = 4))
      },
      append = (b, path) => PqAnnIndex.append(b, "vec_id", "embedding", path),
      validate = (path, full) => PqAnnIndex.validateIndex(s, path,
        source = Some((full, "vec_id", "embedding"))),
      search = (path, qs) => PqAnnIndex.searchMany(s, path, qs, k = 10,
        ef = 512, rerank = Some((e, "vec_id", "embedding"))))
  }

  /** PQ mutation lifecycle gate (`aminsert` + `ambulkdelete` +
    * consolidate for the in-graph PQ kind — reference insert.c:51-262,
    * delete.c:15-73): build over the lower half, batch-`append` the
    * upper half as delta shards (an appended row must be findable by
    * its own vector), then tombstone a known row and require it to
    * vanish through EVERY read path — [[graft.ann.PqAnnIndex.search]],
    * the dequantized [[graft.ann.PqAnnIndex.vectors]] reader, AND the
    * pq-registered PLANNER form (`ORDER BY l2sq_dist LIMIT k` routed
    * through AnnScanLogical) with recall ≥ 0.8 vs the exact truth
    * minus the deleted row. Consolidate then applies the tombstone
    * physically: the row stays gone, the artifact passes
    * [[graft.ann.PqAnnIndex.validateIndex]] against the surviving
    * source rows, and the tombstone dir is retired. Fresh artifact per
    * invocation (mutations would accumulate under bench reps). */
  private def pqDelete(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.{AnnParams, PqAnnIndex}
    import graft.plans.{AnnCatalog, AnnScanLogical}
    import graft.pq.ProductQuantizer
    val e = Tables.embeddings(s, dir)
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-pqdel").toString + "/idx"
    val lower = e.where(col("vec_id") <= maxId / 2)
    val cb = ProductQuantizer.trainCodebook(
      lower, "embedding", subvectors = 8, clusters = 64)
    PqAnnIndex.build(lower, "vec_id", "embedding", path, cb,
      AnnParams(m = 16, efConstruction = 128, ef = 128, numPartitions = 4))
    PqAnnIndex.append(e.where(col("vec_id") > maxId / 2), "vec_id",
      "embedding", path)

    // an APPENDED row must be findable by its own vector (distance-0
    // under the LUT after exact re-rank over the true floats)
    val upId = maxId // highest id — guaranteed in the appended half
    val upVec = e.where(col("vec_id") === upId).select("embedding")
      .head().getSeq[Float](0).toArray
    val appendedFound = PqAnnIndex
      .searchRerank(e, "vec_id", "embedding", path, upVec, k = 10, ef = 128)
      .exists(_._1 == upId)

    // tombstone a BUILT row and chase it through every read path
    val victim = e.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("embedding")).head()
    val vid = victim.getLong(0)
    val vvec = victim.getSeq[Float](1).toArray
    val foundBefore = PqAnnIndex.search(s, path, vvec, k = 5, ef = 128)
      .exists(_._1 == vid)
    PqAnnIndex.delete(s, path, Seq(vid))
    val searchAfter = PqAnnIndex.search(s, path, vvec, k = 5, ef = 128)
    val goneFromSearch = searchAfter.nonEmpty && !searchAfter.exists(_._1 == vid)
    val goneFromVectors = PqAnnIndex.vectors(s, path)
      .where(col("id") === vid).isEmpty

    // planner form: the tombstoned row must not ride a candidate path
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq",
        ef = 512, kind = "pq"))
    val (plannedOk, plannerGone, plannerRecallOk) = try {
      val knn = e.orderBy(
        graft.functions.l2sq_dist(col("embedding"), lit(vvec))).limit(10)
      val planned = knn.queryExecution.optimizedPlan.collect {
        case a: AnnScanLogical if a.kind == "pq" => a
      }.nonEmpty
      val got = knn.select("vec_id").collect().map(_.getLong(0)).toSet
      val truth = graft.ops.VectorSearch.exact(
          e.where(col("vec_id") =!= vid), col("embedding"), vvec, 10,
          "l2sq", tieBreak = Seq(col("vec_id")))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (planned, !got.contains(vid),
        got.nonEmpty && got.intersect(truth).size >= 8)
    } finally AnnCatalog.unregister(s, tablePath)

    // physical apply: consolidate rebuilds without the tombstoned row,
    // retires the tombstones, and the artifact re-validates against
    // the surviving source rows
    PqAnnIndex.consolidate(s, path, numPartitions = 4)
    val searchCons = PqAnnIndex.search(s, path, vvec, k = 5, ef = 128)
    val goneAfterCons = searchCons.nonEmpty && !searchCons.exists(_._1 == vid)
    val survivors = e.where(col("vec_id") =!= vid)
    val consValid = PqAnnIndex.validateIndex(s, path,
      source = Some((survivors, "vec_id", "embedding"))) == survivors.count()

    if (appendedFound && foundBefore && goneFromSearch && goneFromVectors &&
        plannedOk && plannerGone && plannerRecallOk && goneAfterCons &&
        consValid)
      Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  /** IVF autotune gate ([[graft.ann.Autotune.autotuneIvf]] — the
    * `autotune-index` protocol applied to the coarse-probe knob):
    * single nlists=16 build, nprobe swept ascending — candidate sets
    * NEST as nprobe widens and distances within the probed lists are
    * exact, so recall is non-decreasing by construction and
    * nprobe = nlists is the full exact scan (recall 1.0 — the grid
    * always holds a qualifying variant). Recorded-spec check mirroring
    * `autotune_bq`: all grid variants measured, exactly one picked,
    * the pick is the FIRST (cheapest probe fraction) variant meeting
    * the target with every cheaper variant below it, recall monotone
    * non-decreasing in nprobe. */
  private def ivfAutotune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.Autotune
    val target = 0.9
    val grid = Seq(
      Autotune.IvfVariant(16, 1), Autotune.IvfVariant(16, 2),
      Autotune.IvfVariant(16, 4), Autotune.IvfVariant(16, 8),
      Autotune.IvfVariant(16, 12), Autotune.IvfVariant(16, 16))
    val reportPath = AnnQueries.artifactDir("ivftune", dir, "embeddings")
    AnnQueries.cached(reportPath) {
      val rep = Autotune.autotuneIvf(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", queryCount = 5, targetRecall = target,
        grid = grid)
      Autotune.ivfReportDf(s, rep)
        .write.mode("overwrite").parquet(s"$reportPath/report")
    }
    val rows = s.read.parquet(s"$reportPath/report").collect()
      .map(r => (r.getAs[Int]("nlists"), r.getAs[Int]("nprobe"),
        r.getAs[Double]("recall"), r.getAs[Boolean]("picked")))
      .sortBy(_._2)
    val ruleOk = rows.map(v => (v._1, v._2)).toSeq ==
      grid.map(v => (v.nlists, v.nprobe)) && {
        val recalls = rows.map(_._3).toSeq
        val picks = rows.map(_._4).toSeq
        val firstQualifying = recalls.indexWhere(_ >= target)
        firstQualifying >= 0 && picks.count(identity) == 1 &&
          picks(firstQualifying) &&
          recalls.take(firstQualifying).forall(_ < target)
      }
    val monotone = rows.map(_._3).toSeq.sliding(2)
      .forall(p => p.length < 2 || p(0) <= p(1) + 1e-9)
    val exhaustiveExact = rows.last._3 >= 1.0 - 1e-9
    if (ruleOk && monotone && exhaustiveExact) Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  /** IVF-PQ autotune gate ([[graft.ann.Autotune.autotuneIvfPq]] — the
    * two serving knobs (nprobe, rescore ef), reference grid semantics
    * index_autotune/mod.rs:328-358): one build, every variant measured
    * by one batched searchMany under the exact float rerank, grid
    * ordered cheapest-first with a full-probe wide-rerank tail so a
    * qualifying variant always exists. Recorded-spec check: all
    * variants present, exactly one picked = the first qualifying with
    * all cheaper ones below target; at FIXED nprobe recall must be
    * non-decreasing in ef (nested LUT pools under an exact rerank —
    * cross-probe ordering is not promised and not checked). */
  private def ivfPqAutotune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.Autotune
    val target = 0.9
    val grid = Seq(
      Autotune.IvfPqVariant(4, 64), Autotune.IvfPqVariant(4, 256),
      Autotune.IvfPqVariant(8, 64), Autotune.IvfPqVariant(8, 256),
      Autotune.IvfPqVariant(12, 512), Autotune.IvfPqVariant(16, 1024))
    val reportPath = AnnQueries.artifactDir("ivfpqtune", dir, "embeddings")
    AnnQueries.cached(reportPath) {
      val rep = Autotune.autotuneIvfPq(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", queryCount = 5, targetRecall = target,
        grid = grid, nlists = 16, subvectors = 8, clusters = 64)
      Autotune.ivfPqReportDf(s, rep)
        .write.mode("overwrite").parquet(s"$reportPath/report")
    }
    val rows = s.read.parquet(s"$reportPath/report").collect()
      .map(r => (r.getAs[Int]("nprobe"), r.getAs[Int]("ef"),
        r.getAs[Double]("recall"), r.getAs[Boolean]("picked")))
      .sortBy(v => (v._1, v._2))
    val ruleOk = rows.map(v => (v._1, v._2)).toSeq ==
      grid.map(v => (v.nprobe, v.ef)) && {
        val recalls = rows.map(_._3).toSeq
        val picks = rows.map(_._4).toSeq
        val firstQualifying = recalls.indexWhere(_ >= target)
        firstQualifying >= 0 && picks.count(identity) == 1 &&
          picks(firstQualifying) &&
          recalls.take(firstQualifying).forall(_ < target)
      }
    val efMonotone = rows.groupBy(_._1).values.forall { g =>
      g.sortBy(_._2).map(_._3).toSeq.sliding(2)
        .forall(p => p.length < 2 || p(0) <= p(1) + 1e-9)
    }
    if (ruleOk && efMonotone) Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  /** PQ autotune gate ([[graft.ann.Autotune.autotunePq]] — the
    * `autotune-index` protocol for the in-graph PQ serving knob): one
    * codebook + graph build, the `ef` beam width swept ascending under
    * the exact float rerank. A graph walk at a larger ef is NOT a
    * superset of a smaller one (unlike the nested bq/mrl pools), so
    * the recorded-spec check asserts the grid is fully measured with
    * exactly one pick = the FIRST variant meeting the target and every
    * cheaper variant below it — monotonicity deliberately unchecked. */
  private def pqAutotune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.Autotune
    val target = 0.9
    val efs = Seq(16, 32, 64, 128, 256, 400)
    val reportPath = AnnQueries.artifactDir("pqtune", dir, "embeddings")
    AnnQueries.cached(reportPath) {
      val rep = Autotune.autotunePq(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", queryCount = 5, targetRecall = target,
        efs = efs)
      Autotune.pqReportDf(s, rep)
        .write.mode("overwrite").parquet(s"$reportPath/report")
    }
    val rows = s.read.parquet(s"$reportPath/report").collect()
      .map(r => (r.getAs[Int]("ef"), r.getAs[Double]("recall"),
        r.getAs[Boolean]("picked")))
      .sortBy(_._1)
    val ruleOk = rows.map(_._1).toSeq == efs && {
      val recalls = rows.map(_._2).toSeq
      val picks = rows.map(_._3).toSeq
      val firstQualifying = recalls.indexWhere(_ >= target)
      firstQualifying >= 0 && picks.count(identity) == 1 &&
        picks(firstQualifying) &&
        recalls.take(firstQualifying).forall(_ < target)
    }
    if (ruleOk) Seq(1).toDF("ok") else Seq.empty[Int].toDF("ok")
  }

  /** Retune gate ([[graft.ann.Retune]] — the serving-budget refresh
    * the reference leaves to the operator: its knobs are runtime GUCs
    * re-derived per corpus, options.c:324-391, and autotune derives
    * them, index_autotune/mod.rs:328-358): a `kind = "bq"` table is
    * registered with a deliberately STARVED rescore pool (ef = 12 ≈ k
    * — the shape a corpus that outgrew its tuning exhibits, measured
    * for real by the 10× scale probe), then `retune` sweeps the
    * registration's own knob through the PLANNER's rewrite of the
    * plain `orderBy(dist).limit(k)` form against the exact truth.
    * Gated: the sweep starts at the registered value and it provably
    * under-serves; every pre-pick step is below target; the pick is
    * the first qualifying doubling; the registration is updated in
    * place; and a second retune pass over the UPDATED registration —
    * no GUC set, just the catalog — qualifies at its very first step
    * (the re-registered budget actually serves). */
  private def retuneBudget(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.{BqIndex, Retune}
    import graft.plans.AnnCatalog
    val target = 0.9
    val e = Tables.embeddings(s, dir)
    val path = AnnQueries.artifactDir("retunebq", dir, "embeddings")
    AnnQueries.cached(path) {
      BqIndex.build(e, "vec_id", "embedding", path)
    }
    val tablePath = s"$dir/embeddings.parquet"
    // ef = 48 is still provably starved on this corpus (the first step
    // must measure below target) but reaches the qualifying budget in
    // 2-3 doublings instead of 5 — the protocol is identical, the gate
    // just stops paying for sweep steps that prove nothing extra
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq",
        ef = 48, kind = "bq"))
    try {
      val r = Retune.retune(s, tablePath, "embedding", "l2sq",
        k = 10, queryCount = 5, targetRecall = target, maxWiden = 64)
      val sweepOk = r.knob == "ef" && r.registered == 48 &&
        r.steps.map(_.value) == r.steps.indices.map(i => 48 << i) &&
        r.steps.head.recall < target &&
        r.picked.isDefined && r.updated &&
        r.steps.init.forall(_.recall < target) &&
        r.steps.last.recall >= target &&
        AnnCatalog.metaFor(s, tablePath, "embedding", "l2sq")
          .exists(_.ef == r.picked.get)
      val after = Retune.retune(s, tablePath, "embedding", "l2sq",
        k = 10, queryCount = 5, targetRecall = target, maxWiden = 1)
      val servesOk = after.steps.size == 1 && !after.updated &&
        after.picked == r.picked
      if (sweepOk && servesOk) Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally AnnCatalog.unregister(s, tablePath)
  }

  /** The ivf counterpart of `retune_budget`: the swept knob must be
    * `nprobe` (NOT ef — probing is the ivf serving cost), the grid is
    * capped at nlists where the probe is exhaustive and therefore
    * exact, so a qualifying value is guaranteed by construction at any
    * corpus size — retune on ivf can never strand the operator. Gated
    * additionally: a starved nprobe = 1 registration under-serves at
    * the 0.95 floor, and the updated registration qualifies at its
    * first step on the confirmation pass. */
  private def retuneIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.{IvfIndex, Retune}
    import graft.plans.AnnCatalog
    val target = 0.95
    val e = Tables.embeddings(s, dir)
    val path = AnnQueries.artifactDir("retuneivf", dir, "embeddings")
    AnnQueries.cached(path) {
      IvfIndex.build(e, "vec_id", "embedding", path, nlists = 16)
    }
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq",
        ef = 64, kind = "ivf", nprobe = 1))
    try {
      val r = Retune.retune(s, tablePath, "embedding", "l2sq",
        k = 10, queryCount = 5, targetRecall = target, maxWiden = 16)
      val sweepOk = r.knob == "nprobe" && r.registered == 1 &&
        r.steps.head.recall < target &&
        r.picked.isDefined && r.updated &&
        r.steps.init.forall(_.recall < target) &&
        r.steps.last.recall >= target &&
        AnnCatalog.metaFor(s, tablePath, "embedding", "l2sq")
          .exists(_.nprobe == r.picked.get)
      val after = Retune.retune(s, tablePath, "embedding", "l2sq",
        k = 10, queryCount = 5, targetRecall = target, maxWiden = 1)
      val servesOk = after.steps.size == 1 && !after.updated &&
        after.picked == r.picked
      if (sweepOk && servesOk) Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally AnnCatalog.unregister(s, tablePath)
  }

  /** Hamming counterpart of `retune_budget` — the ef knob is
    * metric-agnostic (the reference's GUC applies to every opclass,
    * lantern_hnsw/src/hnsw/options.c:324-391), so a bits-column corpus
    * that outgrows its serving beam must recover with the SAME
    * one-command refresh as the float kinds. The registration is
    * starved at ef = k; the sweep measures the hamming planner form
    * (`ORDER BY hamming_dist(bits, lit) LIMIT k`, which must rewrite
    * to the AnnScan at every step — retune throws otherwise) against a
    * tie-INCLUSIVE exact truth (packed-bit distances tie massively, so
    * any distance-valid answer scores 1.0), and the first qualifying
    * ef re-registers. A confirmation pass over the updated
    * registration qualifies at its first step. */
  private def retuneHamming(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.{AnnIndex, AnnParams, Retune}
    import graft.plans.AnnCatalog
    import graft.pq.ScalarQuantizer
    val target = 0.9
    val e = Tables.embeddings(s, dir)
    val root = AnnQueries.artifactDir("retuneham", dir, "embeddings")
    AnnQueries.cached(root) {
      e.select(col("vec_id"),
          ScalarQuantizer.quantize_b1(col("embedding")).as("bits"))
        .write.mode("overwrite").parquet(s"$root/tbl")
      AnnIndex.build(s.read.parquet(s"$root/tbl"), "vec_id", "bits",
        s"$root/idx", AnnParams(m = 16, efConstruction = 128, ef = 128,
          metric = "hamming", numPartitions = 4))
    }
    val tbl = s"$root/tbl"
    AnnCatalog.register(s, tbl, AnnCatalog.IndexMeta(s"$root/idx",
      "vec_id", "bits", "hamming", ef = 10))
    try {
      val r = Retune.retune(s, tbl, "bits", "hamming",
        k = 10, queryCount = 5, targetRecall = target, maxWiden = 64)
      val sweepOk = r.kind == "hnsw" && r.knob == "ef" &&
        r.registered == 10 &&
        r.steps.map(_.value) == r.steps.indices.map(i => 10 << i) &&
        r.picked.isDefined &&
        r.steps.init.forall(_.recall < target) &&
        r.steps.last.recall >= target &&
        (!r.updated || AnnCatalog.metaFor(s, tbl, "bits", "hamming")
          .exists(_.ef == r.picked.get))
      val after = Retune.retune(s, tbl, "bits", "hamming",
        k = 10, queryCount = 5, targetRecall = target, maxWiden = 1)
      val servesOk = after.steps.size == 1 && !after.updated &&
        after.picked == r.picked
      if (sweepOk && servesOk) Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally AnnCatalog.unregister(s, tbl)
  }

  /** Adversarial-scale regression gate — the geometry-limit story the
    * 10×/30× probes measured ([[graft.tools.DeriveScale
    * .ensureAdversarial]]), promoted from probe narration to a
    * driver-checked gate: copies 1..3 of the corpus are NOVEL mixture
    * points around the source's k-means centers (they densify every
    * query's own region with points NOT derived from it, so recall
    * gets HARDER with scale — jittered replicas would make it easier),
    * a bq registration carries a budget of the size the SOURCE-scale
    * tuning settles on, and the FILTERED planner form — the first to
    * starve as corpora grow, measured by every scale probe — must
    * measure BELOW the floor at that stale budget. `retune` under the
    * same predicate is the documented recovery: its pick must reach
    * the floor, every cheaper step provably below it. Deterministic
    * end to end (seeded derivation, hash-sampled queries); the derived
    * table and the index are fingerprint-cached, so the warm gate
    * costs a few planner probes + one scoped exact-truth pass. */
  private def retuneAdversarial(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.{BqIndex, Retune}
    import graft.plans.AnnCatalog
    // floor chosen one doubling under full recovery: the gate proves
    // the MECHANISM (stale budget starves → one retune recovers), and
    // every extra sweep step is pure gate cost proving nothing more
    val target = 0.85
    val root = AnnQueries.artifactDir("advgeo", dir, "embeddings")
    // a CAPPED deterministic source sample (hash top-N, the repo's
    // sampling primitive) keeps the gate's cost sf-independent: the
    // geometry-limit mechanism it regression-checks is a property of
    // the adversarial DENSITY, not of the absolute corpus size — the
    // full-scale derivative lives in the scale probes
    val srcTbl = s"$root/src"
    AnnQueries.cached(srcTbl) {
      graft.util.Sampling.hashSample(
          Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
          5000, col("vec_id"))
        .write.mode("overwrite").parquet(s"$srcTbl/embeddings.parquet")
    }
    // the derived table lives beside its index under the same source
    // fingerprint: regenerated test data re-derives both. ensure() has
    // its own row-count reuse check, but that is still a Spark job per
    // invocation — the marker makes the warm path one fs.exists
    AnnQueries.cached(s"$root/tbl") {
      graft.tools.DeriveScale.ensureAdversarial(s, srcTbl, s"$root/tbl",
        copies = 4, partitions = 8)
      ()
    }
    val tablePath = s"$root/tbl/embeddings.parquet"
    val idx = s"$root/sig"
    AnnQueries.cached(idx) {
      BqIndex.build(s.read.parquet(tablePath), "vec_id", "embedding", idx)
    }
    AnnCatalog.register(s, tablePath, AnnCatalog.IndexMeta(idx,
      "vec_id", "embedding", "l2sq", ef = 192, kind = "bq"))
    try {
      val r = Retune.retune(s, tablePath, "embedding", "l2sq",
        k = 10, queryCount = 4, targetRecall = target, maxWiden = 64,
        predicate = Some(col("vec_id") % 2 === 0))
      val ok = r.steps.head.recall < target && // the stale budget starves
        r.picked.isDefined && // and the one-command recovery reaches it
        r.steps.last.recall >= target &&
        r.steps.init.forall(_.recall < target)
      if (ok) Seq(1).toDF("ok") else Seq.empty[Int].toDF("ok")
    } finally AnnCatalog.unregister(s, tablePath)
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("streaming_ivf_insert", Some("SELECT 1 AS ok"),
      streamingIvfInsert),
    QueryDef("streaming_ivfpq_insert", Some("SELECT 1 AS ok"),
      streamingIvfPqInsert),
    QueryDef("streaming_pq_insert", Some("SELECT 1 AS ok"),
      streamingPqInsert),
    QueryDef("pq_delete", Some("SELECT 1 AS ok"), pqDelete),
    QueryDef("autotune_ivf", Some("SELECT 1 AS ok"), ivfAutotune),
    QueryDef("autotune_ivfpq", Some("SELECT 1 AS ok"), ivfPqAutotune),
    QueryDef("autotune_pq", Some("SELECT 1 AS ok"), pqAutotune),
    QueryDef("retune_budget", Some("SELECT 1 AS ok"), retuneBudget),
    QueryDef("retune_ivf", Some("SELECT 1 AS ok"), retuneIvf),
    QueryDef("retune_hamming", Some("SELECT 1 AS ok"), retuneHamming),
    QueryDef("retune_adversarial", Some("SELECT 1 AS ok"),
      retuneAdversarial),
  )
}
