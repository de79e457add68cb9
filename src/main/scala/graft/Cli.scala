package graft

import org.apache.spark.sql.SparkSession

/** Command-line entry point — the analog of the reference's
  * `lantern-cli` binary (lantern_cli/src/main.rs:21-86: create-
  * embeddings, show-models, show-runtimes, measure-model-speed,
  * autotune-index, pq-table, start-daemon, start-server; the TCP
  * indexing server is scoped out — Spark IS the external indexer).
  * Every subcommand is a thin dispatcher onto the same library
  * operators; parquet paths stand in for the reference's DB URIs.
  *
  * Usage: `spark-submit --class graft.Cli <jar> <command> [--key value ...]`
  * (or `sbt 'runMain graft.Cli <command> ...'` locally).
  */
object Cli {

  private def usage: String =
    """graft <command> [--key value ...]
      |
      |  create-embeddings  --src P --id-col C --text-col C --out P
      |                     [--runtime hash-mock] [--model mock/tiny]
      |  show-models
      |  show-runtimes
      |  measure-model-speed [--runtime hash-mock] [--model mock/tiny]
      |  create-index       --src P --id-col C --vec-col C --index P
      |                     [--kind hnsw|bq|mrl]
      |                     [--m 16] [--ef-construction 128] [--ef 64]
      |                     [--metric l2sq] [--quant f32] [--partitions 0]
      |                     (mrl: --m is the prefix dim; bq: no flags)
      |  autotune-index     --src P --id-col C --vec-col C
      |                     [--metric l2sq] [--k 10] [--target-recall 0.9]
      |                     [--index P]   (promotes the winner when set)
      |  retune-index       --table P --vec-col C --catalog P
      |                     [--metric l2sq] [--k 10] [--target-recall 0.9]
      |                     [--query-count 8] [--max-widen 16]
      |                     (re-derives the serving budget of an
      |                      EXISTING registration against the current
      |                      corpus via the planner, persists the
      |                      updated catalog — no rebuild)
      |  maintain           --catalog P [--target-recall 0.9] [--k 10]
      |                     [--query-count 8] [--max-widen 16]
      |                     [--no-validate] [--consolidate-over N]
      |                     [--recluster] [--skew-over 4.0]
      |                     [--parallelism N]
      |                     (compact + validate + retune every
      |                      registered index in one sweep; --recluster
      |                      rebuilds skewed coarse-list centroids)
      |  validate-index     --index P [--src P --id-col C --vec-col C]
      |                     (layout auto-detected; with --src the codec
      |                      re-derivation runs too — the reference's
      |                      _validate_index analog)
      |  pq-table           --src P --vec-col C --out P
      |                     [--clusters 256] [--splits 8]
      |  start-daemon       --jobs P --status P --results P --ckpt P
      |                     [--autotune-jobs P] [--autotune-status P]
      |                     [--autotune-results P] [--once]
      |  start-server       --root P [--port 8080] [--catalog F]
      |  sparse-postings    --src P --id-col C --vec-col C --out P
      |                     [--tau 0.125] [--buckets 64]
      |  sparse-search      --postings P --id-col C --terms 1,5,9
      |                     --weights 0.2,0.3,0.1 [--k 10]
      |  multivec-index     --src P --id-col C --vec-col C --out P
      |                     [--toks-per-doc 4] [--nlists 64]
      |  multivec-search    --index P --src P --id-col C --vec-col C
      |                     --query-doc N [--toks-per-doc 4] [--k 10]
      |                     [--nprobe 16] [--cand 64]
      |""".stripMargin

  /** `--key value` pairs plus bare boolean flags (`--once`): an option
    * followed by another option (or by nothing) parses as `-> "true"`. */
  private[graft] def parseArgs(args: Seq[String]): Map[String, String] = {
    val out = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      val k = args(i)
      require(k.startsWith("--"), s"graft: expected --option, got '$k'")
      val isFlag = i + 1 >= args.length || args(i + 1).startsWith("--")
      out(k.stripPrefix("--")) = if (isFlag) "true" else args(i + 1)
      i += (if (isFlag) 1 else 2)
    }
    out.toMap
  }

  /** Options each command understands — unknown/misspelled flags are an
    * error, not a silent fall-through to defaults. */
  private val KnownOpts: Map[String, Set[String]] = Map(
    "show-models" -> Set(),
    "show-runtimes" -> Set(),
    "measure-model-speed" -> Set("runtime", "model"),
    "create-embeddings" -> Set("src", "id-col", "text-col", "out", "runtime", "model"),
    "create-index" -> Set("src", "id-col", "vec-col", "index", "m",
      "ef-construction", "ef", "metric", "quant", "partitions", "kind"),
    "autotune-index" -> Set("src", "id-col", "vec-col", "metric", "k",
      "target-recall", "index"),
    "validate-index" -> Set("index", "src", "id-col", "vec-col"),
    "retune-index" -> Set("table", "vec-col", "catalog", "metric", "k",
      "target-recall", "query-count", "max-widen"),
    "maintain" -> Set("catalog", "target-recall", "k", "query-count",
      "max-widen", "no-validate", "consolidate-over", "recluster",
      "skew-over", "parallelism"),
    "pq-table" -> Set("src", "vec-col", "out", "clusters", "splits"),
    "start-daemon" -> Set("jobs", "status", "results", "ckpt",
      "autotune-jobs", "autotune-status", "autotune-results", "once"),
    "start-server" -> Set("root", "port", "catalog"),
    "sparse-postings" -> Set("src", "id-col", "vec-col", "out", "tau", "buckets"),
    "sparse-search" -> Set("postings", "id-col", "terms", "weights", "k"),
    "multivec-index" -> Set("src", "id-col", "vec-col", "out", "toks-per-doc",
      "nlists"),
    "multivec-search" -> Set("index", "src", "id-col", "vec-col", "query-doc",
      "toks-per-doc", "k", "nprobe", "cand"))

  private def req(opts: Map[String, String], k: String): String =
    opts.getOrElse(k, throw new IllegalArgumentException(s"graft: missing --$k"))

  private def session(): SparkSession =
    SparkSession.builder()
      .appName("graft-cli")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println(usage); sys.exit(2) }
    try run(args.head, parseArgs(args.toSeq.tail))
    catch {
      case e: IllegalArgumentException =>
        System.err.println(e.getMessage)
        System.err.println(usage)
        sys.exit(2)
    }
  }

  private[graft] def run(command: String, opts: Map[String, String]): Unit = {
    val known = KnownOpts.getOrElse(command,
      throw new IllegalArgumentException(s"graft: unknown command '$command'"))
    val unknown = opts.keySet -- known
    require(unknown.isEmpty,
      s"graft: unknown option(s) for $command: ${unknown.toSeq.sorted.map("--" + _).mkString(" ")}")
    command match {
      case "show-models" =>
        // `show_available_models` (embeddings.rs:201-235)
        embed.EmbeddingRuntimes.availableModels.foreach { case (rt, m) =>
          println(f"$rt%-10s ${m.name}%-24s dim=${m.dim}%-6d batch=${m.batchSize}")
        }

      case "show-runtimes" =>
        embed.EmbeddingRuntimes.availableRuntimes.foreach(println)

      case "measure-model-speed" =>
        val rt = embed.EmbeddingRuntimes.get(opts.getOrElse("runtime", "hash-mock"))
        val model = opts.getOrElse("model", "mock/tiny")
        val texts = (0 until 2048).map(i => s"speed probe text number $i with a few words")
        val r = embed.MeasureSpeed.measure(rt, model, texts)
        println(f"${r.model}: ${r.itemsPerSec}%.0f embeddings/s, ${r.tokensPerSec}%.0f tokens/s")

      case "create-embeddings" =>
        val (src, idCol, textCol, outP) =
          (req(opts, "src"), req(opts, "id-col"), req(opts, "text-col"), req(opts, "out"))
        val spark = session()
        val out = embed.EmbeddingPipeline.createEmbeddings(
          spark.read.parquet(src).select(idCol, textCol),
          textCol,
          embed.EmbeddingRuntimes.get(opts.getOrElse("runtime", "hash-mock")),
          opts.getOrElse("model", "mock/tiny"))
        out.write.mode("overwrite").parquet(outP)
        // count failures from the WRITTEN output — counting the lazy
        // pipeline frame would re-run the whole embed pass (double
        // API calls on the paid runtimes)
        val failed = embed.EmbeddingPipeline
          .failedRows(spark.read.parquet(outP)).count()
        println(s"wrote $outP ($failed failed rows)")

      case "create-index" =>
        val (src, idCol, vecCol, idxP) =
          (req(opts, "src"), req(opts, "id-col"), req(opts, "vec-col"), req(opts, "index"))
        val spark = session()
        opts.getOrElse("kind", "hnsw") match {
          case "bq" =>
            // the bq codec is parameter-free — silently dropping hnsw
            // tuning flags would let a user believe they built a tuned
            // index, so explicit flags are an error here
            val hnswOnly = Seq("m", "ef-construction", "ef", "metric",
              "quant", "partitions").filter(opts.contains)
            require(hnswOnly.isEmpty,
              s"--kind bq takes no hnsw tuning flags " +
                s"(got: ${hnswOnly.map("--" + _).mkString(", ")})")
            ann.BqIndex.build(spark.read.parquet(src), idCol, vecCol, idxP)
            println(s"built $idxP (kind=bq: sign-bit signatures + center)")
          case "mrl" =>
            // mrl's one parameter is the prefix dim; it reuses --m (the
            // other hnsw flags make no sense here and are rejected)
            val hnswOnly = Seq("ef-construction", "ef", "metric",
              "quant", "partitions").filter(opts.contains)
            require(hnswOnly.isEmpty,
              s"--kind mrl takes only --m (prefix dim) " +
                s"(got: ${hnswOnly.map("--" + _).mkString(", ")})")
            val m = opts.getOrElse("m", "32").toInt
            ann.MrlIndex.build(spark.read.parquet(src), idCol, vecCol, m, idxP)
            println(s"built $idxP (kind=mrl: first-$m-dims prefix table)")
          case "hnsw" =>
            val h = ann.AnnIndex.build(
              spark.read.parquet(src), idCol, vecCol, idxP,
              ann.AnnParams(
                m = opts.getOrElse("m", "16").toInt,
                efConstruction = opts.getOrElse("ef-construction", "128").toInt,
                ef = opts.getOrElse("ef", "64").toInt,
                metric = opts.getOrElse("metric", "l2sq"),
                numPartitions = opts.getOrElse("partitions", "0").toInt,
                quant = opts.getOrElse("quant", "f32")))
            println(s"built $idxP (dim=${h.dim}, metric=${h.metric}, quant=${h.quant})")
          case other =>
            throw new IllegalArgumentException(
              s"unknown index kind '$other' (expected hnsw|bq|mrl)")
        }

      case "autotune-index" =>
        val (srcP, idCol, vecCol) =
          (req(opts, "src"), req(opts, "id-col"), req(opts, "vec-col"))
        val spark = session()
        val src = spark.read.parquet(srcP)
        val metric = opts.getOrElse("metric", "l2sq")
        val k = opts.getOrElse("k", "10").toInt
        val recall = opts.getOrElse("target-recall", "0.9").toDouble
        val report = opts.get("index") match {
          case Some(idx) =>
            ann.Autotune.autotuneCreate(src, idCol, vecCol, idx, metric,
              k = k, targetRecall = recall)
          case None =>
            ann.Autotune.autotune(src, idCol, vecCol, metric,
              k = k, targetRecall = recall)
        }
        ann.Autotune.reportDf(spark, report).show(100, truncate = false)

      case "retune-index" =>
        // the serving-budget refresh: load the catalog (a fresh JVM
        // holds no registrations), sweep the registration's own knob
        // through the planner against the current corpus, persist the
        // update back. The no-rebuild answer to "my corpus grew and
        // recall dropped" — see graft.ann.Retune.
        val (tableP, vecCol, cat) =
          (req(opts, "table"), req(opts, "vec-col"), req(opts, "catalog"))
        val spark = session()
        plans.AnnCatalog.load(spark, cat)
        val widen = opts.getOrElse("max-widen", "16").toInt
        val metric = opts.getOrElse("metric", "l2sq")
        val kk = opts.getOrElse("k", "10").toInt
        val qc = opts.getOrElse("query-count", "8").toInt
        val tr = opts.getOrElse("target-recall", "0.9").toDouble
        val r =
          if (metric == "maxsim") // multivec: paired knobs, one factor
            ann.Retune.retuneMultivec(spark, tableP, vecCol,
              k = kk, queryCount = qc, targetRecall = tr,
              maxWiden = widen, catalogPath = Some(cat))
          else ann.Retune.retune(spark, tableP, vecCol, metric,
            k = kk, queryCount = qc, targetRecall = tr,
            maxWiden = widen, catalogPath = Some(cat))
        ann.Retune.reportDf(spark, r).show(100, truncate = false)
        r.picked match {
          case Some(p) if r.updated =>
            println(s"retuned ${r.kind} $tableP: ${r.knob} " +
              s"${r.registered} -> $p (catalog saved)")
          case Some(p) =>
            println(s"registration already serves: ${r.knob} $p")
          case None =>
            println(s"no ${r.knob} up to ${r.registered.toLong * widen} " +
              "met the target — widen --max-widen or rebuild with " +
              "better parameters")
        }

      case "maintain" =>
        // one-command maintenance sweep over every catalog
        // registration: compact fragmented artifacts, validate each
        // against its current source, retune stale serving budgets —
        // see graft.ann.Maintain. Exit is nonzero when any index
        // fails validation (the report names it first).
        val cat = req(opts, "catalog")
        val spark = session()
        plans.AnnCatalog.load(spark, cat)
        val entries = ann.Maintain.sweep(spark,
          targetRecall = opts.getOrElse("target-recall", "0.9").toDouble,
          k = opts.getOrElse("k", "10").toInt,
          queryCount = opts.getOrElse("query-count", "8").toInt,
          maxWiden = opts.getOrElse("max-widen", "16").toInt,
          validate = !opts.contains("no-validate"),
          consolidateOver = opts.getOrElse("consolidate-over", "0").toInt,
          catalogPath = Some(cat),
          recluster = opts.contains("recluster"),
          skewOver = opts.getOrElse("skew-over", "4.0").toDouble,
          parallelism = opts.getOrElse("parallelism", "1").toInt)
        ann.Maintain.sweepDf(spark, entries).show(100, truncate = false)
        val bad = entries.filterNot(_.valid)
        if (bad.nonEmpty) throw new IllegalStateException(
          s"graft: ${bad.size} index(es) failed validation: " +
            bad.map(e => s"${e.kind} on ${e.table}").mkString(", "))

      case "validate-index" =>
        // the reference's `_validate_index` as a CLI verb: sniff the
        // artifact layout (same detection order the façade search
        // route uses) and run that kind's validator; with --src the
        // full codec re-derivation runs against the source table.
        // Throws naming the first violation, exit 0 on a valid index.
        val idxP = req(opts, "index")
        val spark = session()
        val source = opts.get("src").map(p =>
          (spark.read.parquet(p), req(opts, "id-col"), req(opts, "vec-col")))
        val (kind, n) =
          if (ann.BqIndex.isBq(spark, idxP)) {
            val (df, idCol, vecCol) = source.getOrElse(
              throw new IllegalArgumentException(
                "graft: bq validation re-derives signatures — " +
                  "--src/--id-col/--vec-col are required"))
            ("bq", ann.BqIndex.validateIndex(df, idCol, vecCol, idxP))
          } else if (ops.SparseSearch.isSparse(spark, idxP))
            ("sparse", ops.SparseSearch.validatePostings(spark, idxP, source))
          else if (ops.MultiVec.isMultiVec(spark, idxP))
            ("multivec", ops.MultiVec.validateIndex(spark, idxP, source))
          else if (ann.MrlIndex.isMrl(spark, idxP))
            ("mrl", ann.MrlIndex.validateIndex(spark, idxP, source))
          else if (ann.IvfPqIndex.isIvfPq(spark, idxP))
            ("ivfpq", ann.IvfPqIndex.validateIndex(spark, idxP, source))
          else if (ann.IvfIndex.isIvf(spark, idxP))
            ("ivf", ann.IvfIndex.validateIndex(spark, idxP, source))
          else if (ann.PqAnnIndex.isPq(spark, idxP))
            ("pq", ann.PqAnnIndex.validateIndex(spark, idxP, source))
          else
            ("hnsw", ann.AnnIndex.validateIndex(spark, idxP, source))
        println(s"valid $idxP (kind=$kind, rows=$n)")

      case "pq-table" =>
        val (srcP, vecCol, outP) =
          (req(opts, "src"), req(opts, "vec-col"), req(opts, "out"))
        val spark = session()
        val src = spark.read.parquet(srcP)
        val cb = pq.ProductQuantizer.trainCodebook(src, vecCol,
          clusters = opts.getOrElse("clusters", "256").toInt,
          subvectors = opts.getOrElse("splits", "8").toInt)
        pq.ProductQuantizer.quantizeTable(src, vecCol, cb)
          .write.mode("overwrite").parquet(outP)
        println(s"wrote $outP")

      case "start-daemon" =>
        val (jobsP, statusP, resultsP, ckptP) =
          (req(opts, "jobs"), req(opts, "status"), req(opts, "results"), req(opts, "ckpt"))
        // before ANY daemon starts: autotune dir flags without the
        // autotune family itself would otherwise be silently unused
        require(opts.contains("autotune-jobs") ||
            (!opts.contains("autotune-status") && !opts.contains("autotune-results")),
          "graft: --autotune-status/--autotune-results need --autotune-jobs")
        val spark = session()
        val once = opts.contains("once")
        val trigger =
          if (once) org.apache.spark.sql.streaming.Trigger.AvailableNow()
          else org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)
        val q = streaming.EmbeddingJobs.daemon(spark,
          jobsP, statusP, resultsP, ckptP, trigger = trigger)
        // the autotune family gets its OWN status/results dirs by
        // default: job_id is the only key in both tables, so a shared
        // dir would let embedding job 1 and autotune job 1 clobber each
        // other's status rows and results/job-1 output
        val aq = opts.get("autotune-jobs").map(dir =>
          streaming.AutotuneJobs.daemon(spark, dir,
            opts.getOrElse("autotune-status", statusP + "-autotune"),
            opts.getOrElse("autotune-results", resultsP + "-autotune"),
            ckptP + "-autotune", trigger = trigger))
        if (once) { q.awaitTermination(); aq.foreach(_.awaitTermination()) }
        else if (aq.isDefined) spark.streams.awaitAnyTermination()
        else q.awaitTermination()

      case "sparse-postings" =>
        val (srcP, idCol, vecCol, outP) =
          (req(opts, "src"), req(opts, "id-col"), req(opts, "vec-col"), req(opts, "out"))
        val tau = opts.getOrElse("tau", "0.125").toFloat
        val spark = session()
        import org.apache.spark.sql.functions.col
        val sv = spark.read.parquet(srcP).select(col(idCol),
          ops.SparseSearch.sparsify(col(vecCol), tau).as("sv"))
        val buckets = opts.getOrElse("buckets",
          ops.SparseSearch.DefaultBuckets.toString).toInt
        ops.SparseSearch.writePostings(
          ops.SparseSearch.postings(sv, idCol, col("sv")), outP, buckets)
        println(s"wrote $outP (term-bucketed postings, tau=$tau, buckets=$buckets)")

      case "sparse-search" =>
        val (postP, idCol) = (req(opts, "postings"), req(opts, "id-col"))
        val qIdx = req(opts, "terms").split(",").map(_.trim.toInt).toSeq
        val qVal = req(opts, "weights").split(",").map(_.trim.toFloat).toSeq
        val k = opts.getOrElse("k", "10").toInt
        val spark = session()
        ops.SparseSearch.invertedTopK(
            ops.SparseSearch.readPostings(spark, postP, qIdx),
            idCol, qIdx, qVal, k)
          .show(k, truncate = false)

      case "multivec-index" =>
        val (srcP, idCol, vecCol, outP) =
          (req(opts, "src"), req(opts, "id-col"), req(opts, "vec-col"), req(opts, "out"))
        val tpd = opts.getOrElse("toks-per-doc", "4").toInt
        val nlists = opts.getOrElse("nlists", "64").toInt
        val spark = session()
        ops.MultiVec.writeIndex(
          ops.MultiVec.tokens(spark.read.parquet(srcP), idCol, vecCol, tpd),
          outP, nlists, toksPerDoc = tpd)
        println(s"wrote $outP (multivec index, nlists=$nlists, toksPerDoc=$tpd)")

      case "multivec-search" =>
        val (idxP, srcP, idCol, vecCol) = (req(opts, "index"), req(opts, "src"),
          req(opts, "id-col"), req(opts, "vec-col"))
        val qDoc = req(opts, "query-doc").toLong
        val spark = session()
        // toksPerDoc comes from the INDEX's own metadata — a resupplied
        // flag that disagrees with build time would slice query docs
        // wrong at the same token dim (garbage scores, no error), so a
        // mismatch is rejected and the flag is only a fallback for
        // pre-metadata indexes
        val (metaTpd, _) = ops.MultiVec.readIndexMeta(spark, idxP)
        val tpd = (opts.get("toks-per-doc").map(_.toInt), metaTpd) match {
          case (Some(f), m) if m > 0 && f != m =>
            throw new IllegalArgumentException(
              s"graft: --toks-per-doc $f conflicts with the index's " +
                s"recorded toksPerDoc $m ($idxP/meta.json) — drop the flag")
          case (_, m) if m > 0 => m
          case (Some(f), _) => f
          case (None, _) => 4
        }
        val k = opts.getOrElse("k", "10").toInt
        val qToks = ops.MultiVec.queryToks(
          ops.MultiVec.tokens(spark.read.parquet(srcP), idCol, vecCol, tpd),
          Seq(qDoc))
        ops.MultiVec.searchIndex(spark, idxP, qToks, k,
            nprobe = opts.getOrElse("nprobe", "16").toInt,
            candPerQuery = opts.getOrElse("cand", "64").toInt)
          .show(k, truncate = false)

      case "start-server" =>
        val rootP = req(opts, "root")
        val spark = session()
        // --catalog F: load planner registrations on start (a restart
        // keeps serving through its indexes), persist after
        // create/drop-index routes
        val facade = new server.HttpFacade(spark, rootP,
          opts.getOrElse("port", "8080").toInt,
          catalogPath = opts.get("catalog")).start()
        println(s"graft http server on 127.0.0.1:${facade.port}")
        Thread.currentThread().join() // serve until killed

      case other => // unreachable: KnownOpts gate rejects first
        throw new IllegalArgumentException(s"graft: unknown command '$other'")
    }
  }
}
