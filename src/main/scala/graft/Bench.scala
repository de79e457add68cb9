package graft
import org.apache.spark.sql.SparkSession

/** Pure pacing decisions for the bench run, split out so they can be
  * spec'd without a SparkSession. The driver runs the bench under an
  * external kill timer; the r13 record was invalidated when that timer
  * fired mid-pass-2 (rc=124, no summary line, 67 spurious per-query
  * "failures" from the post-SIGTERM stopped-context race). The fix is
  * self-pacing: a soft wall-clock budget that sheds rep count — never
  * queries — as it fills, so every run ends with a complete, parseable
  * summary in which any degraded timing is explicitly marked.
  */
object BenchSchedule {
  /** Pass-1 (floor, cap, allowFloorBump) for the next query, given the
    * fraction of the budget already spent. Below 55% the full adaptive
    * protocol runs (floor reps, extend-while-improving to cap, sub-2s
    * queries bumped to 3 reps). Past 55% extension and the short-query
    * bump stop — each query gets exactly its floor. Past 80% everything
    * drops to a single rep: a one-rep timing is noisier but valid, and
    * pass 2's min-merge can only improve it.
    */
  def pass1Reps(frac: Double, floor: Int, cap: Int): (Int, Int, Boolean) =
    if (frac < 0.55) (floor, cap, true)
    else if (frac < 0.80) (floor, floor, false)
    else (1, 1, false)

  /** Pass-2 rep cap for the next query: the usual up-to-3 while under
    * 80% of budget, one rep in 80–95%, zero (skip, keep the valid
    * pass-1 timing, mark the line) past 95%. Skipping pass 2 trades
    * steady-state JIT precision for a record that exists at all.
    */
  def pass2Cap(frac: Double): Int =
    if (frac < 0.80) 3 else if (frac < 0.95) 1 else 0
}

object Bench {

  /** Set by the shutdown hook (external kill timer) — loops drain
    * without starting new work and the hook emits a partial summary. */
  @volatile private var terminating = false

  /** A rep that dies because the SIGTERM race already stopped the
    * SparkContext is the RUN ending, not the query failing — the r13
    * record mislabeled 67 healthy queries this way. */
  private def isStoppedContext(t: Throwable): Boolean = {
    val m = Option(t.getMessage).getOrElse("")
    m.contains("stopped SparkContext") ||
      m.contains("SparkContext has been shutdown") ||
      t.isInstanceOf[InterruptedException]
  }

  /** Fixed serial integer workload (~1e8 xorshift steps). Wall time is
    * ~constant on a quiet host; recorded into the bench artifact so a
    * contended capture window is visible in the JSON itself instead of
    * masquerading as a code regression (this VM shows up to 8×
    * run-to-run swings — see tools/RepeatBench).
    */
  private def calibrateSerial(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 100000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    if (x == 42) System.err.println("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  /** The same workload fanned out over every core as one Spark stage —
    * single-threaded probes stay flat in bad windows while parallel
    * throughput craters, so THIS is the number that exposes host
    * contention (plus scheduler overhead, which is part of what the
    * queries pay too).
    */
  private def calibrateParallel(spark: SparkSession, slots: Int): Double = {
    val t0 = System.nanoTime()
    spark.sparkContext.parallelize(1 to slots, slots).foreach { p =>
      var x = 0x9E3779B97F4A7C15L + p
      var i = 0
      while (i < 50000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      if (x == 42) System.err.println("")
    }
    (System.nanoTime() - t0) / 1e9
  }

  /** 1-minute host load average — sampled per query into the JSONL so
    * a co-tenant load spike is visible NEXT TO the timing it distorted
    * (the r11 record had 2-4x inflations on unchanged code that only
    * cross-record forensics could attribute; the calibration probes
    * bracket the run's ends but can't see mid-run sustained load). */
  private def loadAvg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+")(0).toDouble
      finally src.close()
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    // the soft budget clock starts HERE — before session build and
    // warmup — because the external kill timer the budget defends
    // against times the whole process, not just the measured passes
    val runStart = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - runStart) / 1e9
    // default sized from the record: a quiet full run at sf0.1 is
    // ~27 min wall (COVERAGE.md r14 note), the r12 clean driver run
    // finished, and the r13 loaded run was killed somewhere past it —
    // 35 min lets a quiet run finish undegraded and sheds reps under
    // load instead of meeting the kill timer
    val budgetS = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_BUDGET_S", "2100").toDouble
    def frac: Double = elapsedS / budgetS
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the sf test files are a few MB — at the default 128 MB
      // maxPartitionBytes they scan as 1-3 partitions and every
      // map-side operator serializes onto one core; small splits
      // restore full parallelism (real deployments size this knob to
      // executor memory instead)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table, then run EVERY query once at the
    // smallest sf — whole-stage codegen compiles per plan shape, so
    // without this the first measured query of each shape absorbs
    // several seconds of JIT that has nothing to do with the data scale
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => try Tables.read(spark, sfDir, t).count()
      catch { case _: Throwable => })
    val warmSf = "/root/testdata/sf0.001"
    if (new java.io.File(warmSf).isDirectory && warmSf != sfDir)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmSf).queryExecution.toRdd.foreach(_ => ())
        catch { case _: Throwable => }
      }
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }

    val calibSerial0 = calibrateSerial()
    val calibParallel0 = calibrateParallel(spark, cpus.toInt)

    // a failed query is REPORTED, never masked: per-query status in the
    // JSON, a "failed" list, and a nonzero exit code
    //
    // Each query reports its MINIMUM across TWO FULL PASSES over the
    // query list, each pass an ADAPTIVE rep loop. Why two passes: the
    // adaptive stop ("latest rep stopped improving >12%") is satisfied
    // by a cold-JIT plateau — with 100+ codegen'd plans compiling in
    // one JVM, a sub-second query can measure a stable 6x-inflated
    // number in pass 1 because C2 hasn't reached it yet (r8 artifact:
    // stem_tokens 3.89s vs 0.66s warm). By pass 2 every plan in the
    // suite has compiled, so one rep lands on the steady state; the
    // min across passes defeats list-order effects. Within a pass:
    // at least `reps` reps (floored at 3 when the first rep is < 2 s —
    // exactly the short queries JIT noise distorts most and an extra
    // rep costs least), extending while the best still improves > 12%
    // up to `maxReps`. Host weather (virtualized neighbors, up to 8×
    // swings — tools/RepeatBench) is additionally bracketed by the
    // calib probes recorded in the artifact. The plan is evaluated in
    // FULL each rep (toRdd.foreach, not count(): count lets Catalyst
    // prune every projected column, so map-heavy queries would measure
    // a row count instead of their actual compute).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val maxReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_REPS", "6").toInt.max(reps)

    def adaptiveBest(
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        floor: Int, cap: Int, seed: Double,
        allowBump: Boolean = true): (Double, Option[String]) = {
      var best = seed
      var err: Option[String] = None
      var r = 0
      var improving = true
      var minFloor = floor
      while (!terminating && err.isEmpty &&
          (r < minFloor || (r < cap && improving))) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
          val t = (System.nanoTime() - t0) / 1e9
          if (allowBump && r == 0 && t < 2.0) minFloor = math.max(minFloor, 3)
          improving = t < best * 0.88
          best = math.min(best, t)
        } catch {
          case t: Throwable if terminating || isStoppedContext(t) =>
            // the run is being killed; any best-so-far stays valid
            terminating = true
          case t: Throwable =>
            System.err.println(
              s"[bench] FAILED: ${t.getClass.getName}: ${t.getMessage}")
            err = Some(t.getClass.getSimpleName)
        }
        r += 1
      }
      (best, err)
    }

    // per-query JSONL is ALSO persisted to a repo file: the driver's
    // stdout tail buffer is smaller than the final summary map, so
    // printed per-query lines get cut (r8/r9 each recovered only ~half
    // the timings) — a committed file survives any capture window.
    // Lines stream into a .tmp sibling and rename over the final name
    // only on completion: a crashed run leaves the previous complete
    // record intact (plus its own partial .tmp), instead of truncating
    // it at start.
    val jsonlPath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_JSONL", "bench_last_run.jsonl")
    val jsonlTmp = jsonlPath + ".tmp"
    val jsonl = new java.io.PrintWriter(
      new java.io.FileWriter(jsonlTmp, /*append=*/ false))
    def emit(line: String): Unit = {
      println(line)
      jsonl.synchronized { jsonl.println(line); jsonl.flush() }
    }

    val ordered = SparkEntry.queries.toSeq
    var degraded = 0
    val pass1 = new scala.collection.mutable.LinkedHashMap[
      String, (Double, Option[String], Double)]
    // finished (name, sec, err, load) rows accumulate here so the
    // shutdown hook can emit a partial-but-parseable summary if the
    // external kill timer fires despite the soft budget
    val results = new scala.collection.mutable.ArrayBuffer[
      (String, Double, Option[String], Double)]
    @volatile var completed = false
    def partialSummary(): (String, String) = {
      val snap = results.synchronized { results.toList }
      val seen = snap.map(_._1).toSet
      // queries that finished pass 1 but never reached their pass-2
      // slot still carry a valid timing — fold them in
      val p1 = pass1.synchronized {
        pass1.toList.collect { case (n, (b, e, _)) if !seen.contains(n) =>
          (n, if (e.isEmpty && b < Double.MaxValue) b else 0.0, e, -1.0)
        }
      }
      val all = snap ++ p1
      val qs = all.map { case (k, v, _, _) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val failed = all.collect { case (k, _, Some(_), _) => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      val total = all.map(_._2).sum
      (s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failed":$failed,"partial":true,"wall":$elapsedS,""" +
        s""""budget":$budgetS,"sf":"$sfDir"}""",
        s"""{"metric":"total","value":$total,"unit":"sec","partial":true,""" +
          s""""wall":$elapsedS,"budget":$budgetS,""" +
          s""""n_queries":${all.size},"sf":"$sfDir"}""")
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      terminating = true
      if (!completed) {
        // full line first, compact totals-only line LAST — a tail-only
        // capture window keeps the parseable compact line (see the
        // completed-run emit below for the rationale)
        val (line, compact) = partialSummary()
        println(line)
        println(compact)
        jsonl.synchronized {
          jsonl.println(line); jsonl.println(compact); jsonl.flush() }
      }
    }))

    ordered.foreach { case (name, fn) =>
      if (!terminating) {
        val l0 = loadAvg()
        val (f, c, bump) = BenchSchedule.pass1Reps(frac, reps, maxReps)
        if ((f, c, bump) != ((reps, maxReps, true))) degraded += 1
        val (b, e) = adaptiveBest(fn, f, c, Double.MaxValue, allowBump = bump)
        if (b < Double.MaxValue || e.isDefined)
          pass1.synchronized { pass1(name) = (b, e, l0) }
      }
    }
    ordered.foreach { case (name, fn) =>
      pass1.get(name).filter(_ => !terminating).foreach {
        case (b1, e1, load1) =>
      val load2 = loadAvg()
      val (best, err, pass2Err, skipped) =
        if (e1.isDefined) (0.0, e1, None, false)
        else BenchSchedule.pass2Cap(frac) match {
          case 0 =>
            // budget exhausted: the pass-1 timing is valid, just not
            // steady-state-JIT-polished; mark the line rather than
            // risk the kill timer invalidating the whole record
            degraded += 1
            (b1, None, None, true)
          case cap2 =>
            // pass 2: everything is JIT'd now; 1 rep usually suffices,
            // extend only while still beating the cross-pass best. A
            // pass-2 error gets ONE retry (transient blips happen); a
            // PERSISTENT pass-2 failure keeps the valid pass-1 timing
            // but is recorded as a failure — a query that breaks only
            // on re-execution (artifact mutation / state accumulation
            // across reps) must not read as a clean pass.
            val (b2, e2) = adaptiveBest(fn, 1, cap2, b1)
            if (e2.isEmpty) (math.min(b1, b2), None, None, false)
            else if (terminating) (b1, None, None, false)
            else {
              val (b3, e3) = adaptiveBest(fn, 1, 1, b1)
              if (e3.isEmpty) (math.min(b1, b3), None, None, false)
              else (b1, None, e3, false)
            }
        }
      // a spike DURING the pass-2 reps themselves must land on this
      // query's stamp, not the next one's pre-sample
      val load3 = loadAvg()
      val marker = err.map(e => s""","failed":"$e"""")
        .orElse(pass2Err.map(e => s""","pass2_failed":"$e""""))
        .getOrElse(if (skipped) ""","pass2_skipped":true""" else "")
      // the WORST of the samples bracketing both passes: a quiet record
      // shows the baseline (~0 idle), a contended one flags exactly
      // which timings to distrust
      val load = math.max(math.max(load1, load2), load3)
      emit(s"""{"q":"$name","sec":${if (err.isEmpty) best else 0.0},"load":$load$marker}""")
      results.synchronized {
        results += ((name, if (err.isEmpty) best else 0.0,
          err.orElse(pass2Err), load))
      }
      }
    }

    val calibSerial1 = calibrateSerial()
    val calibParallel1 = calibrateParallel(spark, cpus.toInt)
    val loadEnd = loadAvg()

    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(_), _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // per-query max over BOTH passes — a pass-2-only spike must not
    // read as a quiet record
    val loads = results.map(_._4).filter(_ >= 0)
    val loadMax = if (loads.isEmpty) -1.0 else loads.max
    val calib =
      s"""{"serial_start":$calibSerial0,"parallel_start":$calibParallel0,""" +
        s""""serial_end":$calibSerial1,"parallel_end":$calibParallel1,""" +
        s""""load_end":$loadEnd,"load_max":$loadMax}"""
    val summary = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"calib":$calib,"wall":$elapsedS,"budget":$budgetS,"degraded":$degraded,"sf":"$sfDir"}"""
    emit(summary)
    // The full summary line is ~8 KB at 197 queries; a capture window
    // that keeps only a stdout TAIL truncates it mid-map and loses every
    // timing (PERF_r15/r16 both had per_query: {} for exactly this
    // reason). Two mitigations, neither changing what is measured:
    //  - the full summary map is ALSO persisted to a per-core-count
    //    file (a scaling run at a different $SPARK_GRAFT_CPUS no longer
    //    clobbers the main run's map);
    //  - a SECOND, compact totals-only line goes out LAST, small enough
    //    to always survive a tail buffer and parse on its own.
    val summaryFile = s"bench_summary_c$cpus.json"
    try {
      val tmp = java.nio.file.Paths.get(summaryFile + ".tmp")
      java.nio.file.Files.write(tmp,
        (summary + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(summaryFile),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch { case t: Throwable =>
      System.err.println(s"[bench] could not write $summaryFile: $t") }
    emit(s"""{"metric":"total","value":$total,"unit":"sec","wall":$elapsedS,"budget":$budgetS,"degraded":$degraded,"n_queries":${results.size},"n_failed":${results.count(_._3.isDefined)},"calib":$calib,"queries_file":"$summaryFile","sf":"$sfDir"}""")
    completed = true
    jsonl.close()
    java.nio.file.Files.move(
      java.nio.file.Paths.get(jsonlTmp), java.nio.file.Paths.get(jsonlPath),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
