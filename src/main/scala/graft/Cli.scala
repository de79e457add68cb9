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
      |                     [--m 16] [--ef-construction 128] [--ef 64]
      |                     [--metric l2sq] [--quant f32] [--partitions 0]
      |  autotune-index     --src P --id-col C --vec-col C
      |                     [--metric l2sq] [--k 10] [--target-recall 0.9]
      |                     [--index P]   (promotes the winner when set)
      |  pq-table           --src P --vec-col C --out P
      |                     [--clusters 256] [--splits 8]
      |  start-daemon       --jobs P --status P --results P --ckpt P
      |                     [--autotune-jobs P] [--once]
      |  start-server       --root P [--port 8080]
      |""".stripMargin

  private[graft] def parseArgs(args: Seq[String]): Map[String, String] = {
    require(args.length % 2 == 0, s"graft: dangling option in ${args.mkString(" ")}")
    args.grouped(2).map {
      case Seq(k, v) =>
        require(k.startsWith("--"), s"graft: expected --option, got '$k'")
        k.stripPrefix("--") -> v
      case other => throw new IllegalArgumentException(other.toString)
    }.toMap
  }

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

  private[graft] def run(command: String, opts: Map[String, String]): Unit =
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
        val failed = embed.EmbeddingPipeline.failedRows(out).count()
        println(s"wrote $outP ($failed failed rows)")

      case "create-index" =>
        val (src, idCol, vecCol, idxP) =
          (req(opts, "src"), req(opts, "id-col"), req(opts, "vec-col"), req(opts, "index"))
        val spark = session()
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
        val spark = session()
        val once = opts.contains("once")
        val trigger =
          if (once) org.apache.spark.sql.streaming.Trigger.AvailableNow()
          else org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)
        val q = streaming.EmbeddingJobs.daemon(spark,
          jobsP, statusP, resultsP, ckptP, trigger = trigger)
        val aq = opts.get("autotune-jobs").map(dir =>
          streaming.AutotuneJobs.daemon(spark, dir, statusP, resultsP,
            ckptP + "-autotune", trigger = trigger))
        if (once) { q.awaitTermination(); aq.foreach(_.awaitTermination()) }
        else { aq.foreach(_ => ()); q.awaitTermination() }

      case "start-server" =>
        val rootP = req(opts, "root")
        val spark = session()
        val facade = new server.HttpFacade(spark, rootP,
          opts.getOrElse("port", "8080").toInt).start()
        println(s"graft http server on 127.0.0.1:${facade.port}")
        Thread.currentThread().join() // serve until killed

      case other =>
        throw new IllegalArgumentException(s"graft: unknown command '$other'")
    }
}
