package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftConf
import graft.plans.AnnCatalog

/** One-command index maintenance over every catalog registration —
  * what a long-lived deployment runs on a schedule, as one sweep
  * instead of the operator hand-chaining per-kind verbs (the loop
  * [[graft.tools.IndexMaintenanceProbe]] proved stays healthy, and
  * what the reference delegates to autovacuum + per-index SQL calls:
  * `_validate_index` lantern_hnsw/src/hnsw/validate_index.c:436-528,
  * autotune lantern_cli/src/index_autotune/mod.rs:328-358).
  *
  * Per registration, in dependency order:
  *  1. COMPACT when the artifact's data-file count exceeds the
  *     threshold (appends accumulate delta files; search fan-out and
  *     listing cost grow with them) — each kind's own `consolidate`,
  *     flat layouts re-targeted by row volume (~1M rows/file, the
  *     façade's sizing).
  *  2. VALIDATE the artifact against its CURRENT source table (the
  *     kind's `validateIndex` codec re-derivation). A violation marks
  *     the row invalid and skips retune — a corrupt index must be
  *     rebuilt, not retuned — but never aborts the sweep: the report
  *     names the casualty, the other indexes still get maintained.
  *  3. RETUNE ([[Retune.retune]]) when the kind's serving knob is
  *     sweepable (ef / nprobe under an l2sq|cos|inner planner form):
  *     re-derive the budget against the corpus as it is TODAY, update
  *     the registration, persist to `catalogPath` when given.
  *
  * Scale shape: everything per-entry is one driver loop over the
  * registrations; the work inside is the kinds' own distributed jobs.
  * Nothing corpus-sized reaches the driver. Entries default to serial
  * because retune steers the planner through SESSION-scoped ef/nprobe
  * GUCs — but `parallelism` > 1 lifts that safely by giving each
  * entry its own `spark.newSession()` clone (shared SparkContext and
  * catalog, isolated runtime conf), so a catalog-scale sweep over
  * hundreds of registrations runs `parallelism` entries wide with no
  * knob trampling.
  */
object Maintain {

  /** One registration's maintenance outcome. Sentinel -1 for recall /
    * knob fields of rows where retune does not apply, and for the file
    * counts when the compact step could not even measure them (the
    * failure is named in `notes`). */
  case class Entry(
      table: String, vecCol: String, metric: String, kind: String,
      filesBefore: Int, filesAfter: Int, consolidated: Boolean,
      valid: Boolean, validatedRows: Long,
      knob: String, knobBefore: Int, knobAfter: Int,
      recallBefore: Double, recallAfter: Double, retuned: Boolean,
      listSkew: Double, notes: String)

  /** Sweep every registration currently in [[AnnCatalog]] (load
    * `catalogPath` first yourself, or via [[graft.Cli]] `maintain`).
    * `consolidateOver` = 0 uses `spark.graft.ann.consolidateShards`.
    * Retune updates persist to `catalogPath` when given — written
    * ONCE, after every entry finished (single writer regardless of
    * `parallelism`).
    *
    * `parallelism` > 1 maintains that many TABLES concurrently, each
    * lane on its own `spark.newSession()` clone: the clone shares the
    * SparkContext, the JVM-wide catalog, and the injected planner
    * rules, but has an ISOLATED runtime conf — so each entry's retune
    * steers its own session's ef/nprobe GUCs without trampling a
    * sibling's mid-measurement (the reason the sweep was previously
    * serial by design). Registrations of the SAME table always run
    * serially in one lane: they share one catalog key, and a sibling
    * racing retuneMultivec's lift/restore of that key is the one
    * lost-update window this sweep could otherwise open. At catalog
    * scale (hundreds of tables, each entry's work a distributed job)
    * this still turns the sweep's wall clock from sum-of-entries into
    * max-of-lanes. */
  def sweep(
      spark: SparkSession,
      targetRecall: Double = 0.9,
      k: Int = 10,
      queryCount: Int = 8,
      maxWiden: Int = 16,
      validate: Boolean = true,
      consolidateOver: Int = 0,
      catalogPath: Option[String] = None,
      recluster: Boolean = false,
      skewOver: Double = 4.0,
      parallelism: Int = 1): Seq[Entry] = {
    require(parallelism >= 1,
      s"graft: maintain parallelism must be >= 1, got $parallelism")
    val threshold =
      if (consolidateOver > 0) consolidateOver
      else GraftConf.annConsolidateShards(spark)
    val work = AnnCatalog.entries()
    // every COMPLETED entry, recorded as it finishes — the catalog
    // save below runs in a finally so a late fatal error (a lane that
    // dies past every named-casualty catch) can never lose an earlier
    // entry's already-applied retune: its knob is in the JVM catalog
    // and gets persisted regardless
    val done = new java.util.concurrent.ConcurrentLinkedQueue[Entry]()
    def one(session: SparkSession, table: String,
        meta: AnnCatalog.IndexMeta): Entry = {
      val e = maintainOne(session, table, meta, threshold, targetRecall,
        k, queryCount, maxWiden, validate, recluster, skewOver)
      done.add(e)
      e
    }
    try {
      if (parallelism <= 1 || work.size <= 1)
        work.map { case (table, meta) => one(spark, table, meta) }
      else {
        // LANES: all registrations of one table run serially on one
        // worker. Retune's truth pass lifts its own registration from
        // the JVM-wide catalog for its duration (per-index granularity,
        // [[AnnCatalog.unregisterOne]]) — still, two entries of the
        // SAME table mutate the same catalog key concurrently
        // (register-on-pick vs lift/restore), so same-table overlap is
        // made structurally impossible rather than merely unlikely
        // (the reference's per-index locks live under PG's per-table
        // relation locking for the same reason). Lanes keep the
        // catalog-scale win: tables are many, registrations per table
        // are few.
        val lanes = work.groupBy(_._1).toSeq.sortBy(_._1).map(_._2)
        val pool = java.util.concurrent.Executors
          .newFixedThreadPool(math.min(parallelism, lanes.size))
        try {
          val futures = lanes.map { lane =>
            pool.submit(new java.util.concurrent.Callable[Seq[Entry]] {
              def call(): Seq[Entry] = {
                // fresh conf per lane: GUC writes stay private
                val session = spark.newSession()
                lane.map { case (table, meta) => one(session, table, meta) }
              }
            })
          }
          futures.flatMap { fu =>
            try fu.get()
            catch {
              // callers see the lane's ORIGINAL error, not the
              // executor's wrapper
              case e: java.util.concurrent.ExecutionException =>
                throw e.getCause
            }
          }
        } finally pool.shutdown()
      }
    } finally {
      // single catalog writer regardless of parallelism
      var anyRetuned = false
      done.forEach(e => if (e.retuned) anyRetuned = true)
      if (anyRetuned) catalogPath.foreach(AnnCatalog.save(spark, _))
    }
  }

  private def maintainOne(
      spark: SparkSession, table: String, meta: AnnCatalog.IndexMeta,
      threshold: Int, targetRecall: Double, k: Int, queryCount: Int,
      maxWiden: Int, validate: Boolean, recluster: Boolean,
      skewOver: Double): Entry = {
    val idx = meta.artifact
    val notes = Seq.newBuilder[String]

    // 1. compact — each kind's own fragmentation measure + consolidate.
    // ANY failure (unreadable artifact, a refused/failed swap) is a
    // named report row, never a sweep abort — the same contract as
    // validate/skew/retune below: the sweep exists to name the
    // casualty and keep maintaining the rest. `consolidated` reports
    // what actually HAPPENED, so a failed compact reads false with the
    // error in `notes`; file counts keep sentinel -1 when even the
    // measurement failed.
    var filesBefore = -1
    var filesAfter = -1
    var consolidated = false
    try {
      filesBefore = fileCount(spark, meta.kind, idx)
      if (filesBefore > threshold) {
        // flat layouts re-target by row volume (~1M rows/file, the
        // façade's sizing); coarse-list kinds re-pack one file per list
        lazy val target = math.max(1, math.ceil(
          spark.read.parquet(table).count() / 1e6).toInt)
        meta.kind match {
          case "bq" => BqIndex.consolidate(spark, idx, target)
          case "mrl" => MrlIndex.consolidate(spark, idx, target)
          case "ivf" => IvfIndex.consolidate(spark, idx)
          case "ivfpq" => IvfPqIndex.consolidate(spark, idx)
          case "pq" => PqAnnIndex.consolidate(spark, idx, target)
          case "sparse" => graft.ops.SparseSearch.consolidatePostings(spark, idx)
          case "multivec" => graft.ops.MultiVec.consolidateIndex(spark, idx)
          case _ => AnnIndex.consolidate(spark, idx, target)
        }
        consolidated = true
        filesAfter = fileCount(spark, meta.kind, idx)
      } else filesAfter = filesBefore
    } catch {
      case scala.util.control.NonFatal(e) =>
        notes += s"consolidate: ${e.getMessage}"
        if (filesAfter < 0) filesAfter = filesBefore
    }

    // 2. validate against the CURRENT source — a violation is a report
    // row, not a sweep abort; a corrupt index is named, never retuned
    var valid = true
    var validatedRows = -1L
    if (validate) {
      // ANY failure here (violation, missing/unreadable artifact, bad
      // schema) is a named report row, never a sweep abort — the sweep
      // exists to name the casualty and keep maintaining the rest
      try validatedRows = validateOne(spark, table, meta)
      catch {
        case scala.util.control.NonFatal(e) =>
          valid = false
          notes += s"validate: ${e.getMessage}"
      }
    }

    // 2b. coarse-list skew (ivf/ivfpq): appends file new rows under
    // the PERSISTED centroids, so drifting data piles into few lists.
    // Retune compensates by widening nprobe but pays probe cost every
    // query — past 4x max/mean the structural fix is a rebuild (fresh
    // kmeans), and the sweep says so instead of silently widening
    // forever. One small aggregation over the list layout. A FAILED
    // measurement (unreadable data/, bad schema) is a named report
    // row, not a silent "no skew" — the sweep's contract is naming
    // casualties, so the error lands in `notes` like validate's do.
    def measureSkew(): Double =
      if (meta.kind != "ivf" && meta.kind != "ivfpq") -1.0
      else try {
        import org.apache.spark.sql.functions.{avg, col, max}
        // tombstoned rows are masked at search — counting them would
        // let a mostly-deleted list fake the skew that triggers the
        // (destructive) recluster
        val live = FlatArtifact.minusTombstones(spark, idx,
          spark.read.parquet(s"$idx/data"))
        val r = live.groupBy(col("list_id")).count()
          .agg(max(col("count")).cast("double"), avg(col("count")))
          .head()
        r.getDouble(0) / math.max(r.getDouble(1), 1e-9)
      } catch {
        case scala.util.control.NonFatal(e) =>
          notes += s"skew: ${e.getMessage}"
          -1.0
      }
    var listSkew = measureSkew()
    if (listSkew > skewOver) {
      if (recluster && !validate) {
        // with --no-validate, `valid` is VACUOUSLY true — nothing
        // certified the artifact's tombstones against the table, so a
        // rebuild could resurrect deleted rows the table still holds.
        // Refuse: recluster's no-resurrection contract must hold
        // independently of whether the operator skipped validation.
        notes += f"list skew $listSkew%.1fx but recluster refused " +
          "under validate=false - recluster rebuilds from the source " +
          "table and needs the validation pass to certify it first"
      } else if (recluster && valid) {
        // the structural fix, applied: fresh coarse kmeans over the
        // current table MINUS the artifact's pending tombstones, same
        // recorded knobs, move-aside swap with rollback. Runs BEFORE
        // retune so the budget is derived against the fresh layout.
        try {
          val pre = listSkew
          reclusterArtifact(spark, table, meta)
          listSkew = measureSkew()
          notes += f"reclustered: skew $pre%.1fx -> $listSkew%.1fx"
          // the row's `valid` must describe the artifact that now
          // serves, not the one the swap retired
          if (validate) validatedRows = validateOne(spark, table, meta)
        } catch {
          case scala.util.control.NonFatal(e) =>
            valid = false
            notes += s"recluster: ${e.getMessage}"
        }
      } else if (!valid) {
        notes += f"list skew $listSkew%.1fx (max/mean rows) on an " +
          "index that FAILED validation - recluster refused; rebuild " +
          "from a trusted source"
      } else {
        notes += f"list skew $listSkew%.1fx (max/mean rows): coarse " +
          "centroids stale for the current data - rerun with " +
          "recluster=true (or rebuild)"
      }
    }

    // 3. retune the serving knob where sweepable: ef/nprobe under a
    // scalar planner form (hamming included — a bits-column corpus
    // retunes through its own hnsw graph form; the reference's ef GUC
    // is metric-agnostic, options.c:324-391), paired cand+nprobe for
    // multivec
    val scalarSweep = (Set("l2sq", "cos", "inner").contains(meta.metric) &&
      meta.kind != "sparse" && meta.kind != "multivec") ||
      (meta.metric == "hamming" && meta.kind == "hnsw")
    val mvSweep = meta.kind == "multivec" && meta.metric == "maxsim"
    if (valid && !scalarSweep && !mvSweep) notes += (meta.kind match {
      case "sparse" => "retune n/a: sparse pre-rank is exact"
      case _ => s"retune n/a: metric ${meta.metric}"
    })
    val r: Option[Retune.Report] =
      if (!valid || (!scalarSweep && !mvSweep)) None
      else try Some(
        if (mvSweep)
          Retune.retuneMultivec(spark, table, meta.vecCol,
            k, queryCount, targetRecall, maxWiden)
        else
          Retune.retune(spark, table, meta.vecCol, meta.metric,
            k, queryCount, targetRecall, maxWiden, None))
      catch {
        // rewrite stopped matching, a require() tripped (ef=0 in a
        // hand-edited catalog, empty source table), artifact unreadable
        // — report and move on, same contract as validation
        case scala.util.control.NonFatal(e) =>
          notes += s"retune: ${e.getMessage}"
          None
      }

    Entry(table, meta.vecCol, meta.metric, meta.kind,
      filesBefore, filesAfter, consolidated,
      valid, validatedRows,
      knob = r.map(_.knob).getOrElse(""),
      knobBefore = r.map(_.registered).getOrElse(-1),
      knobAfter = r.flatMap(_.picked).orElse(r.map(_.registered))
        .getOrElse(-1),
      recallBefore = r.map(_.steps.head.recall).getOrElse(-1.0),
      // pair recall_after with the knob the row actually ends on: the
      // pick's step when one qualified, else the REGISTERED value's
      // step (nothing qualified, the registration was left untouched —
      // reporting the widest swept recall next to the old knob would
      // claim a recall the serving path does not achieve)
      recallAfter = r.map(rr =>
        if (rr.picked.isDefined) rr.steps.last.recall
        else rr.steps.head.recall).getOrElse(-1.0),
      retuned = r.exists(_.updated),
      listSkew = listSkew,
      notes = notes.result().mkString("; "))
  }

  /** The kind's own fragmentation measure — delta/data files for the
    * flat and coarse-list layouts, graph shards for hnsw/pq. The
    * bucket-partitioned kinds (sparse `tb=*`, multivec
    * `postings/cent=*`) measure EXCESS over their consolidated floor
    * of one file per partition directory: a freshly consolidated
    * artifact reads 1 no matter how many lists it has, and each append
    * adds its file count — counting every file would make a list-heavy
    * artifact trip the threshold on EVERY sweep and trigger a full
    * rebuild that cannot reduce the number (the natural floor IS the
    * list count). */
  private def fileCount(spark: SparkSession, kind: String,
      idx: String): Int = kind match {
    case "bq" => BqIndex.fileCount(spark, idx)
    case "mrl" => MrlIndex.fileCount(spark, idx)
    case "ivf" => IvfIndex.fileCount(spark, idx)
    case "ivfpq" => IvfPqIndex.fileCount(spark, idx)
    case "pq" => PqAnnIndex.shardCount(spark, idx)
    case "hnsw" => AnnIndex.shardCount(spark, idx)
    case _ =>
      // the bucket-partitioned kinds serve from a resolved generation
      // dir after their first consolidate — measure what SERVES
      val root =
        if (kind == "multivec") graft.ops.MultiVec.postingsDir(spark, idx)
        else if (kind == "sparse") graft.ops.SparseSearch.dataDir(spark, idx)
        else idx
      val p = new Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0
      else {
        val it = fs.listFiles(p, true)
        var files = 0
        val dirs = scala.collection.mutable.HashSet[String]()
        while (it.hasNext) {
          val f = it.next().getPath
          val name = f.getName
          if (!name.startsWith("_") && !name.startsWith(".")) {
            files += 1
            dirs += f.getParent.toString
          }
        }
        // one file per partition dir == fully consolidated == 1;
        // pending sparse tombstone files are pure fragmentation on top
        // (consolidate applies and retires them), so they keep feeding
        // the trigger even though they live at the root, outside the
        // resolved data generation
        val pendingTombs =
          if (kind != "sparse") 0
          else {
            val t = new Path(s"$idx/_tombstones")
            if (!fs.exists(t)) 0
            else fs.listStatus(t).count(_.isFile)
          }
        (if (files == 0) 0 else files - dirs.size + 1) + pendingTombs
      }
  }

  /** Rebuild a coarse-list artifact's centroids from the CURRENT
    * table: every build knob is recovered from the artifact itself
    * (nlists = stored centroid count; ivfpq codebook geometry from the
    * codebook parquet's distinct (subvector_id, centroid_id); metric
    * from the artifact meta), so the operator never re-supplies
    * parameters the index already records. Rows the artifact has
    * TOMBSTONED are excluded from the rebuild (the table may lag the
    * index's deletes — rebuilding from the raw table would resurrect
    * them) and the tombstone files are carried into the new artifact,
    * so the validator's pending-delete excusal keeps holding against
    * the lagging table. Swap is move-aside + rename + rollback (the
    * [[FlatArtifact.consolidateSubdir]] convention) — no window where
    * the only copy of the index is a completed `fs.delete`. */
  private[graft] def reclusterArtifact(spark: SparkSession, table: String,
      meta: AnnCatalog.IndexMeta,
      beforeTombCarry: () => Unit = () => ()): Unit = {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val idx = meta.artifact
    val fs = new Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tombDir = new Path(s"$idx/tombstones")
    val raw = spark.read.parquet(table)
    val df =
      if (fs.exists(tombDir))
        raw.join(spark.read.parquet(tombDir.toString)
            .select(col("id").as("__graft_tomb_id")),
          col(meta.idCol).cast("long") === col("__graft_tomb_id"),
          "left_anti")
      else raw
    val nlists = spark.read.parquet(s"$idx/centroids").count().toInt
    val tmp = idx + ".reclustering"
    val tmpPath = new Path(tmp)
    // a crashed prior attempt leaves the tmp dir behind and the build
    // below would fail on the existing parquet path forever — clear it
    // first, and clean up again when THIS build throws, so recluster
    // stays retryable without manual repair
    if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
    try meta.kind match {
      case "ivf" =>
        IvfIndex.build(df, meta.idCol, meta.vecCol, tmp, nlists,
          IvfIndex.metricOf(spark, idx))
      case "ivfpq" =>
        val cb = spark.read.parquet(s"$idx/codebook")
        val r = cb.agg(countDistinct(col("subvector_id")).cast("int"),
          countDistinct(col("centroid_id")).cast("int")).head()
        IvfPqIndex.build(df, meta.idCol, meta.vecCol, tmp, nlists,
          r.getInt(0), r.getInt(1), IvfPqIndex.metricOf(spark, idx))
      case other => throw new IllegalArgumentException(
        s"graft: recluster applies to coarse-list kinds, not '$other'")
    } catch {
      case scala.util.control.NonFatal(e) =>
        if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
        throw e
    }
    val p = new Path(idx)
    val backup = new Path(idx + ".replaced")
    if (fs.exists(backup)) fs.delete(backup, true)
    if (!fs.rename(p, backup)) throw new IllegalStateException(
      s"graft: recluster could not move $idx aside — index untouched")
    if (!fs.rename(tmpPath, p)) {
      fs.rename(backup, p) // rollback: the original serves again
      throw new IllegalStateException(
        s"graft: recluster swap failed under $idx — original restored")
    }
    // carry pending tombstones: their rows are applied physically in
    // the rebuild, but the lagging table still holds them — the
    // validator's missing-row excusal needs the files. The carry is
    // file-by-file rename into a verified destination DIRECTORY, each
    // result checked, and the backup is deleted only after every file
    // verifiably landed: an unchecked whole-dir rename could fail (or
    // nest, the Hadoop rename-into-existing-dir behavior the sparse
    // swap documents) and the delete below would then destroy the only
    // copy of the pending deletes — the silent-delete-loss class this
    // repo eliminates everywhere else. On failure the backup stays for
    // recovery and the error is loud; the rebuilt artifact still
    // serves correctly (its rows physically exclude the tombstoned
    // ids), and the next validation flags the lagging table.
    beforeTombCarry()
    val backupTomb = new Path(s"$backup/tombstones")
    if (fs.exists(backupTomb)) {
      val dest = new Path(s"$idx/tombstones")
      if (fs.exists(dest) && !fs.getFileStatus(dest).isDirectory)
        throw new IllegalStateException(
          s"graft: recluster tombstone carry blocked — $dest exists " +
            s"and is not a directory; pending deletes preserved at " +
            s"$backupTomb (backup NOT deleted)")
      if (!fs.exists(dest) && !fs.mkdirs(dest))
        throw new IllegalStateException(
          s"graft: recluster tombstone carry could not create $dest; " +
            s"pending deletes preserved at $backupTomb (backup NOT " +
            "deleted)")
      fs.listStatus(backupTomb).filter(_.isFile).foreach { st =>
        val to = new Path(dest, st.getPath.getName)
        if (!fs.rename(st.getPath, to) || !fs.exists(to))
          throw new IllegalStateException(
            s"graft: recluster tombstone carry failed for " +
              s"${st.getPath.getName}; pending deletes preserved at " +
              s"$backupTomb (backup NOT deleted)")
      }
    }
    fs.delete(backup, true)
    ()
  }

  private def validateOne(spark: SparkSession, table: String,
      meta: AnnCatalog.IndexMeta): Long = {
    val idx = meta.artifact
    lazy val df = spark.read.parquet(table)
    lazy val src = Some((df, meta.idCol, meta.vecCol))
    meta.kind match {
      case "bq" => BqIndex.validateIndex(df, meta.idCol, meta.vecCol, idx)
      case "mrl" => MrlIndex.validateIndex(spark, idx, src)
      case "ivf" => IvfIndex.validateIndex(spark, idx, src)
      case "ivfpq" => IvfPqIndex.validateIndex(spark, idx, src)
      case "pq" => PqAnnIndex.validateIndex(spark, idx, src)
      case "sparse" =>
        graft.ops.SparseSearch.validatePostings(spark, idx, src)
      case "multivec" => graft.ops.MultiVec.validateIndex(spark, idx, src)
      case _ => AnnIndex.validateIndex(spark, idx, source = src)
    }
  }

  /** The sweep report as a DataFrame (deterministic order). */
  def sweepDf(spark: SparkSession, entries: Seq[Entry]): DataFrame = {
    import spark.implicits._
    entries
      .map(e => (e.table, e.vecCol, e.metric, e.kind, e.filesBefore,
        e.filesAfter, e.consolidated, e.valid, e.validatedRows, e.knob,
        e.knobBefore, e.knobAfter, e.recallBefore, e.recallAfter,
        e.retuned, e.listSkew, e.notes))
      .toDF("table", "vec_col", "metric", "kind", "files_before",
        "files_after", "consolidated", "valid", "validated_rows", "knob",
        "knob_before", "knob_after", "recall_before", "recall_after",
        "retuned", "list_skew", "notes")
      .orderBy("table", "kind", "vec_col", "metric")
  }
}
