package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftConf
import graft.ops.VectorSearch
import graft.plans.{AnnCatalog, AnnFilteredIdsLogical, AnnScanLogical}

/** Serving-budget refresh for an EXISTING registration — closing the
  * loop the reference leaves to the operator: its search knobs are
  * runtime GUCs the user is expected to re-derive as the corpus grows
  * (`lantern_hnsw.ef` — lantern_hnsw/src/hnsw/options.c:324-391), and
  * autotune is the tool that derives them
  * (lantern_cli/src/index_autotune/mod.rs:328-358). The 10×/30× scale
  * probes (COVERAGE.md) measured exactly that staleness: the filtered
  * forms of the compact-code kinds drop below the recall floor at 10×
  * rows and recover under a ~4× wider runtime pool, no code change.
  *
  * `retune` automates the recovery WITHOUT a rebuild: it sweeps the
  * registration's own serving knob — `ef` for the rescore-pool kinds
  * (hnsw / bq / mrl / pq / ivfpq), `nprobe` for ivf — through the
  * PLANNER's rewrite of the real query form (plain
  * `orderBy(dist).limit(k)`, optionally under the workload's filter
  * predicate, whose selectivity is what actually starves a fixed
  * pool), measured against the exact truth on the CURRENT corpus, and
  * re-registers the first qualifying value. The sweep stops at the
  * first qualifier (every recorded cheaper step is provably below
  * target), so cost is bounded by the distance between the stale and
  * the adequate budget, not by the grid ceiling.
  *
  * Scale shape: `queryCount` planner probes per step (each an indexed
  * search — the whole point is that these are cheap), plus ONE exact
  * kNN join for the truth (broadcast queries, one pass over the
  * corpus). Nothing corpus-sized ever reaches the driver.
  */
object Retune {

  /** One measured knob value. `avgSearchMs` is the mean PER-QUERY
    * serving latency, each probe timed inside its own worker thread —
    * comparable round over round regardless of the fan-out's
    * concurrency. */
  case class Step(value: Int, recall: Double, avgSearchMs: Double)

  /** Run one sweep step's planner probes CONCURRENTLY: each probe is a
    * small multi-job indexed search, so wall clock is driver job-launch
    * latency, not compute — the scheduler interleaves jobs from
    * multiple submitter threads (the same shape as `validate_all`'s
    * validator fleet). The GUC under sweep is session state shared by
    * every probe in the step, set once before the fan-out. Probe
    * failures (the planner-stopped-rewriting guard) are unwrapped so
    * the caller sees the original error. Returns the per-query results
    * plus the mean PER-PROBE latency in ms, each probe timed inside
    * its own thread — dividing the fan-out's wall clock by the query
    * count would under-report serving latency by up to the concurrency
    * factor, and `Step.avgSearchMs` feeds reports compared round over
    * round. */
  private def probeAll[Q, A](pool: java.util.concurrent.ExecutorService,
      queries: Array[(Long, Q)])(
      run: (Long, Q) => A): (Map[Long, A], Double) = {
    val futs = queries.map { case (qid, q) =>
      qid -> pool.submit(new java.util.concurrent.Callable[(A, Long)] {
        def call(): (A, Long) = {
          val t0 = System.nanoTime()
          val r = run(qid, q)
          (r, System.nanoTime() - t0)
        }
      })
    }
    val resolved = futs.map { case (qid, fu) =>
      qid -> (try fu.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw e.getCause
      })
    }
    (resolved.map { case (qid, (r, _)) => qid -> r }.toMap,
      resolved.map(_._2._2).sum / 1e6 / math.max(resolved.length, 1))
  }

  /** Start `f` on its own daemon thread NOW and hand back the join —
    * the exact-truth pass is independent of the sweep's planner probes
    * (it reads only the corpus, never the GUC under sweep), so it
    * overlaps with the first step's probe fan-out instead of running
    * serially before it (guide §2.6). A fresh thread, not
    * ForkJoinPool.commonPool: the blocking collect must not occupy a
    * shared common-pool worker. The join rethrows the job's own
    * exception unwrapped; joining more than once is free. */
  private def overlapped[A](f: => A): () => A = {
    val fut = java.util.concurrent.CompletableFuture.supplyAsync(
      () => f,
      (r: Runnable) => {
        val t = new Thread(r, "graft-retune-truth")
        t.setDaemon(true)
        t.start()
      })
    () =>
      try fut.join()
      catch {
        case e: java.util.concurrent.CompletionException => throw e.getCause
      }
  }

  /** Sweep record: `registered` is the knob value found in the
    * catalog, `steps` every value measured (ascending; all pre-pick
    * steps are below target by construction), `picked` the first
    * qualifying value, `updated` whether the registration changed. */
  case class Report(kind: String, knob: String, registered: Int,
      targetRecall: Double, steps: Seq[Step], picked: Option[Int],
      updated: Boolean)

  /** Re-derive and re-register the serving budget of the
    * (tablePath, vecCol, metric) registration against the current
    * corpus. `maxWiden` caps the sweep at `registered × maxWiden`
    * (doubling grid); `predicate` scopes both the measured query form
    * and the truth to the workload's filter; `catalogPath`, when set,
    * persists the updated catalog (the serving-restart contract).
    * Throws if the table has no such registration or the form stops
    * rewriting through the planner mid-sweep (either is operator
    * error, not a tuning outcome). Returns the report; when no value
    * up to the cap qualifies, `picked` is None and the registration
    * is left untouched — widen `maxWiden` or rebuild with better
    * build-time parameters.
    */
  def retune(
      spark: SparkSession,
      tablePath: String,
      vecCol: String,
      metric: String = "l2sq",
      k: Int = 10,
      queryCount: Int = 8,
      targetRecall: Double = 0.9,
      maxWiden: Int = 16,
      predicate: Option[Column] = None,
      catalogPath: Option[String] = None): Report = {
    require(Set("l2sq", "cos", "inner", "hamming").contains(metric),
      s"graft: retune sweeps the vector planner forms " +
        s"(l2sq|cos|inner|hamming), got '$metric'")
    require(maxWiden >= 1, s"graft: maxWiden must be >= 1, got $maxWiden")
    val meta = AnnCatalog.metaFor(spark, tablePath, vecCol, metric)
      .getOrElse(throw new IllegalArgumentException(
        s"graft: no ($vecCol, $metric) registration for $tablePath — " +
          "retune re-derives an EXISTING registration's budget"))
    // a bits-column corpus retunes exactly like a float one — the
    // reference's ef GUC is metric-agnostic
    // (lantern_hnsw/src/hnsw/options.c:324-391); only the sample
    // extraction differs (b1-packed array<int> vs array<float>)
    val isHamming = metric == "hamming"
    require(!isHamming || meta.kind == "hnsw",
      s"graft: hamming serves through the hnsw graph form; a " +
        s"'${meta.kind}' registration under metric=hamming is a " +
        "mislabel the planner would never rewrite")
    val knobIsNprobe = meta.kind == "ivf"
    val knob = if (knobIsNprobe) "nprobe" else "ef"
    val registered = if (knobIsNprobe) meta.effectiveNprobe else meta.ef
    require(registered >= 1,
      s"graft: registration carries $knob=$registered; nothing to sweep")

    val table = spark.read.parquet(tablePath)
    val scoped = predicate.map(table.where).getOrElse(table)
    val base = scoped.select(col(meta.idCol), col(vecCol))

    // Deterministic query sample + ONE batched exact-truth pass over
    // the (possibly predicate-scoped) current corpus.
    val sampled = graft.util.Sampling
      .hashSample(
        base.select(col(meta.idCol).cast("long").as("id"), col(vecCol)),
        queryCount, col("id"))
      .collect()
    require(sampled.nonEmpty,
      "graft: retune needs at least one sample row under the predicate")
    // (query id, plan-time literal of its vector) — the literal is the
    // serving-path sort operand; keep the planner's rewrite pattern
    // (hamming_dist / dist over an un-cast literal), not a wrapper
    val queries: Array[(Long, Column)] = sampled.map { r =>
      r.getLong(0) -> (
        if (isHamming) lit(r.getSeq[Int](1).toArray)
        else lit(r.getSeq[Float](1).toArray))
    }
    def distCol(q: Column): Column =
      if (isHamming) graft.functions.hamming_dist(col(vecCol), q)
      else VectorSearch.distance(metric, col(vecCol), q)
    import spark.implicits._
    val qdf =
      if (isHamming)
        sampled.toSeq.map(r => (r.getLong(0), r.getSeq[Int](1).toArray))
          .toDF("query_id", "__qv")
      else
        sampled.toSeq.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
          .toDF("query_id", "__qv")
    // Scalar truth: the exact id set (exactly k rows per query reach
    // the driver, knnJoinExact's contract). Overlapped with the first
    // sweep step's probes — the truth never reads the GUC under sweep.
    val truthIdsF: () => Map[Long, Set[Long]] =
      if (isHamming) { () => Map.empty }
      else overlapped(VectorSearch
        .knnJoinExact(qdf, "query_id", "__qv", base,
          meta.idCol, vecCol, k, metric)
        .select(col("query_id"), col("neighbor_id").cast("long"))
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap)
    // Hamming truth: a DISTANCE THRESHOLD per query, not an id set.
    // Packed-bit distances are small integers that tie massively, so a
    // strict id top-k is not well-defined — any answer within the k-th
    // distance is distance-valid and must score full recall (the
    // repo's hamming gates compare distance multisets for the same
    // reason). Materializing the tie-inclusive id SET driver-side is
    // unbounded (the k-th distance can admit a large fraction of the
    // corpus), so the threshold + admitted-row count are aggregated
    // distributed-side — exactly queryCount rows reach the driver —
    // and the probe's answers are judged against the threshold. The
    // row_number window stays map-side top-k (partial
    // WindowGroupLimit), same one-pass broadcast shape as knnJoinExact.
    val hammingKthF: () => Map[Long, (Double, Long)] =
      if (!isHamming) { () => Map.empty }
      else overlapped {
        import org.apache.spark.sql.expressions.Window
        val q = broadcast(qdf)
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("dist"), col("neighbor_id"))
        base
          .select(col(meta.idCol).cast("long").as("neighbor_id"),
            col(vecCol).as("__dv"))
          .crossJoin(q)
          .withColumn("dist",
            VectorSearch.distance(metric, col("__dv"), col("__qv"))
              .cast("double"))
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") <= k)
          .groupBy(col("query_id"))
          .agg(max(col("dist")).as("kth"), count(lit(1)).as("n"))
          .collect()
          .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
          .toMap
      }

    // Long math + an Int.MaxValue ceiling: a large registered × widen
    // product must stop the grid, not wrap negative into a GUC the
    // planner would silently ignore (c > 0 falls back to the stale ef)
    val cap = math.min(registered.toLong * maxWiden, Int.MaxValue.toLong)
    val grid = Iterator.iterate(registered.toLong)(_ * 2)
      .takeWhile(_ <= cap).map(_.toInt).toSeq

    val gucKey = if (knobIsNprobe) GraftConf.AnnNprobe else GraftConf.AnnEf
    val prior = spark.conf.getOption(gucKey)
    val steps = Seq.newBuilder[Step]
    var picked: Option[Int] = None
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(queries.length, 8))
    try {
      val it = grid.iterator
      while (picked.isEmpty && it.hasNext) {
        val v = it.next()
        spark.conf.set(gucKey, v.toString)
        val (got, avgMs) = probeAll(pool, queries) { (_, q) =>
          val knn = base
            .orderBy(distCol(q))
            .limit(k)
          // the scalar form rewrites to AnnScanLogical; a predicate-
          // scoped sweep takes the FILTERED planner form (adaptive
          // over-fetch + exact fallback) — both are the serving path
          val planned = knn.queryExecution.optimizedPlan.collect {
            case a: AnnScanLogical if a.kind == meta.kind => a: Any
            case f: AnnFilteredIdsLogical if f.kind == meta.kind => f: Any
          }.nonEmpty
          if (!planned) throw new IllegalStateException(
            s"graft: the $metric form over $tablePath did not rewrite " +
              s"to the ${meta.kind} AnnScan at $knob=$v — retune " +
              "measures the planner's serving path, not a table scan")
          // id + distance: hamming scoring judges answers against the
          // exact k-th-distance threshold (re-deriving the distance on
          // the ≤ k returned rows is free)
          knn.select(col(meta.idCol).cast("long"),
              distCol(q).cast("double"))
            .collect().map(r => (r.getLong(0), r.getDouble(1)))
        }
        var hits = 0; var total = 0
        queries.foreach { case (qid, _) =>
          val returned = got.getOrElse(qid, Array.empty[(Long, Double)])
          if (isHamming) {
            // an answer is a hit iff it lies within the exact k-th
            // distance — tie-inclusive recall without materializing
            // the tie set; denominator = what an exact search returns
            val (kth, n) = hammingKth.getOrElse(qid,
              (Double.NegativeInfinity, 0L))
            hits += returned.count(_._2 <= kth)
            total += math.min(k.toLong, n).toInt
          } else {
            val expected = truthIds.getOrElse(qid, Set.empty)
            hits += returned.count(p => expected.contains(p._1))
            total += expected.size
          }
        }
        val recall = if (total == 0) 1.0 else hits.toDouble / total
        steps += Step(v, recall, avgMs)
        if (recall >= targetRecall) picked = Some(v)
      }
    } finally {
      pool.shutdown()
      prior match {
        case Some(v) => spark.conf.set(gucKey, v)
        case None => spark.conf.unset(gucKey)
      }
    }

    val updated = picked.exists(_ != registered)
    if (updated) {
      val p = picked.get
      val next = if (knobIsNprobe) meta.copy(nprobe = p)
        else meta.copy(ef = p)
      AnnCatalog.register(spark, tablePath, next)
      catalogPath.foreach(AnnCatalog.save(spark, _))
    }
    Report(meta.kind, knob, registered, targetRecall,
      steps.result(), picked, updated)
  }

  /** The multivec counterpart of [[retune]] — completing the retune
    * matrix across every approximate kind. A `kind = "multivec"`
    * registration serves through TWO paired knobs (per-token probe
    * count `nprobe` and stage-1 candidate budget `cand`, registered as
    * `ef`), and widening one without the other starves differently
    * (few probes → missing lists; small cand → truncated stage-1). So
    * the sweep widens BOTH by the same doubling factor — `Step.value`
    * records the swept `cand`, with `nprobe` scaled proportionally —
    * through the PLANNER's maxsim rewrite (`orderBy(maxsim_score(toks,
    * Q).desc).limit(k)`), measured against the exact MaxSim truth in
    * ONE batched corpus pass ([[graft.ops.MultiVec.maxsimJoinExact]],
    * computed with the registration temporarily lifted, because the
    * scoring sort would otherwise itself rewrite). First qualifying
    * factor is re-registered (ef AND nprobe); the probe count clamps
    * to the centroid count inside the scan, so over-widening is safe.
    *
    * `predicate` scopes BOTH the measured query form and the truth to
    * the workload's filter — the filtered maxsim form is what actually
    * starves as a corpus grows (a fixed candidate budget thins under
    * selectivity), so a filtered workload must be retuned against
    * itself, exactly like the scalar path's `predicate`.
    */
  def retuneMultivec(
      spark: SparkSession,
      tablePath: String,
      vecCol: String,
      k: Int = 10,
      queryCount: Int = 8,
      targetRecall: Double = 0.9,
      maxWiden: Int = 16,
      catalogPath: Option[String] = None,
      predicate: Option[Column] = None): Report = {
    require(maxWiden >= 1, s"graft: maxWiden must be >= 1, got $maxWiden")
    val meta = AnnCatalog.metaFor(spark, tablePath, vecCol, "maxsim")
      .getOrElse(throw new IllegalArgumentException(
        s"graft: no ($vecCol, maxsim) registration for $tablePath"))
    require(meta.kind == "multivec",
      s"graft: maxsim retune expects kind=multivec, got '${meta.kind}'")
    val (cand0, nprobe0) = (meta.ef, meta.effectiveNprobe)
    require(cand0 >= 1 && nprobe0 >= 1,
      s"graft: registration carries cand=$cand0 nprobe=$nprobe0")

    val table = spark.read.parquet(tablePath)
    val scoped = predicate.map(table.where).getOrElse(table)
    val queries = graft.util.Sampling
      .hashSample(
        scoped.select(col(meta.idCol).cast("long").as("id"), col(vecCol)),
        queryCount, col("id"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[scala.collection.Seq[Float]](1).map(_.toArray).toArray))
    require(queries.nonEmpty,
      "graft: retune needs at least one sample row under the predicate")

    // exact truth in ONE batched pass over the (possibly predicate-
    // scoped) corpus, with THIS registration — and only this one —
    // lifted: the per-query scoring sort would rewrite through the
    // multivec index otherwise, but a sibling registration (another
    // column/metric on the same table) never matches the maxsim sort,
    // so lifting it too would only blind a concurrent maintainer's
    // planner probe and clobber its freshly-retuned meta on restore
    // (per-index lock granularity, like the reference's PG locking).
    // Same tie-break as the serving sort (score desc, id).
    val lifted = AnnCatalog.unregisterOne(spark, tablePath, vecCol, "maxsim")
    val truth =
      try graft.ops.MultiVec
        .maxsimJoinExact(scoped, meta.idCol, vecCol, queries.toSeq, k)
        .select(col("query_id"), col("neighbor_id"))
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      finally lifted.foreach(AnnCatalog.register(spark, tablePath, _))

    // factor capped so the widened cand stays an Int (same wrap hazard
    // as the scalar grid)
    val factors = Iterator.iterate(1L)(_ * 2)
      .takeWhile(f => f <= maxWiden &&
        cand0.toLong * f <= Int.MaxValue &&
        nprobe0.toLong * f <= Int.MaxValue)
      .map(_.toInt).toSeq
    val (efKey, npKey) = (GraftConf.AnnEf, GraftConf.AnnNprobe)
    val (efPrior, npPrior) =
      (spark.conf.getOption(efKey), spark.conf.getOption(npKey))
    val steps = Seq.newBuilder[Step]
    var picked: Option[Int] = None
    var pickedFactor = 1
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(queries.length, 8))
    try {
      val it = factors.iterator
      while (picked.isEmpty && it.hasNext) {
        val f = it.next()
        spark.conf.set(efKey, (cand0 * f).toString)
        spark.conf.set(npKey, (nprobe0 * f).toString)
        val (got, avgMs) = probeAll(pool, queries) { (_, qm) =>
          val knn = scoped
            .orderBy(graft.ops.MultiVec.maxsimCol(col(vecCol), qm).desc,
              col(meta.idCol))
            .limit(k)
          // a predicate-scoped sweep must measure the FILTERED planner
          // form (pred pushed into the scan) — that is the serving
          // path whose budget is being re-derived
          val planned = knn.queryExecution.optimizedPlan.collect {
            case m: graft.plans.MaxSimIdsLogical
                if predicate.isEmpty || m.pred.isDefined => m
          }.nonEmpty
          if (!planned) throw new IllegalStateException(
            s"graft: the maxsim form over $tablePath did not rewrite " +
              s"through the multivec index at factor $f")
          knn.select(col(meta.idCol).cast("long"))
            .collect().map(_.getLong(0)).toSet
        }
        var hits = 0; var total = 0
        queries.foreach { case (qid, _) =>
          val expected = truth.getOrElse(qid, Set.empty)
          hits += got.getOrElse(qid, Set.empty).intersect(expected).size
          total += expected.size
        }
        val recall = if (total == 0) 1.0 else hits.toDouble / total
        steps += Step(cand0 * f, recall, avgMs)
        if (recall >= targetRecall) { picked = Some(cand0 * f); pickedFactor = f }
      }
    } finally {
      pool.shutdown()
      efPrior match {
        case Some(v) => spark.conf.set(efKey, v)
        case None => spark.conf.unset(efKey)
      }
      npPrior match {
        case Some(v) => spark.conf.set(npKey, v)
        case None => spark.conf.unset(npKey)
      }
    }

    val updated = picked.exists(_ != cand0)
    if (updated) {
      AnnCatalog.register(spark, tablePath,
        meta.copy(ef = picked.get, nprobe = nprobe0 * pickedFactor))
      catalogPath.foreach(AnnCatalog.save(spark, _))
    }
    Report(meta.kind, "cand+nprobe", cand0, targetRecall,
      steps.result(), picked, updated)
  }

  /** The report as a DataFrame (one row per measured step), the same
    * persistence shape the autotune reports use. */
  def reportDf(spark: SparkSession, r: Report): DataFrame = {
    import spark.implicits._
    r.steps
      .map(s => (r.kind, r.knob, r.registered, s.value, s.recall,
        s.avgSearchMs, r.picked.contains(s.value), r.updated))
      .toDF("kind", "knob", "registered", "value", "recall",
        "avg_search_ms", "picked", "updated")
  }
}
