package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

/** Scale probe for the STREAMING family — sustained-microbatch
  * evidence the stateful operators survive an infinite feed, the
  * claim the per-gate streaming twins (a handful of chunks each)
  * cannot certify. Like DedupScaleProbe, the plants ARE the oracle:
  *
  *  - feed: `batches` waves, one minute of event time apart, each
  *    carrying every sf document once with a WAVE-UNIQUE fingerprint
  *    (so distinct state keys grow linearly with the feed — the shape
  *    that kills an unbounded-state design), plus two planted
  *    duplicate classes per wave:
  *      WITHIN  — re-arrival in the NEXT wave (gap 60 s < delay):
  *                must be dropped, fp emitted exactly once;
  *      REEMIT  — re-arrival `reemitGap` waves later (event-time gap
  *                far beyond delay + watermark lag): state must have
  *                EXPIRED, fp emitted exactly twice.
  *  - operator: the production bounded-state path
  *    (`dropDuplicatesWithinWatermark` under
  *    [[StreamingDedup.dropDuplicatesWithinDelay]]), file-source in,
  *    parquet sink out — nothing stream-sized touches the driver.
  *
  * PASS requires all four at once: duplicate semantics exact (both
  * plant classes), singleton completeness (every unique fp emitted
  * exactly once), state BOUNDED (max state rows ≈ the watermark
  * horizon's key count, not the feed's), and per-batch wall FLAT
  * (late-feed batches no slower than early ones beyond a JIT/noise
  * factor) — the last two are exactly "does this run forever".
  *
  * Usage: runMain graft.tools.StreamScaleProbe [srcSfDir] [batches] [delaySec]
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val batches = args.lift(1).map(_.toInt).getOrElse(24)
    val delaySec = args.lift(2).map(_.toInt).getOrElse(150)
    val reemitGap = 10 // waves; 600 s event-time gap ≫ delay + 1-wave lag
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

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .select($"doc_id", $"text")
    val nDocs = docs.count()
    val t0Epoch = 1700000000L

    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-probe").toString
    def chunkDir(b: Int) = f"$root/chunks/c$b%03d"

    // ------------------------- build the feed -------------------------
    // wave-unique fp = hash(doc_id, wave); plants REUSE their origin
    // wave's fp (same key through the real state machinery). Plant
    // membership is deterministic (doc_id % k) so the driver-side
    // oracle below needs no data exchange with the feed builder.
    def wave(b: Int): DataFrame = {
      val base = docs
        .withColumn("fp", xxhash64($"doc_id", lit(b)))
        .withColumn("ts",
          to_timestamp(lit(t0Epoch + b * 60L).cast("long")))
      // plant membership by modulo class — deterministic, so the
      // oracle below re-derives the exact planted fp sets
      val within =
        if (b == 0) None
        else Some(docs.where($"doc_id" % 25 === 3)
          .withColumn("fp", xxhash64($"doc_id", lit(b - 1)))
          .withColumn("ts",
            to_timestamp(lit(t0Epoch + b * 60L + 1).cast("long"))))
      val reemit =
        if (b < reemitGap) None
        else Some(docs.where($"doc_id" % 25 === 7)
          .withColumn("fp", xxhash64($"doc_id", lit(b - reemitGap)))
          .withColumn("ts",
            to_timestamp(lit(t0Epoch + b * 60L + 2).cast("long"))))
      (Seq(base) ++ within ++ reemit).reduce(_ unionAll _)
    }
    (0 until batches).foreach { b =>
      wave(b).coalesce(1).write.mode("overwrite").parquet(chunkDir(b))
    }
    val chunkFiles = (0 until batches).map { b =>
      new java.io.File(chunkDir(b)).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .minBy(_.getName)
    }

    // ---------------------- drive the microbatches ---------------------
    val srcStreamDir = s"$root/src"
    val outDir = s"$root/out"
    val ckDir = s"$root/ck"
    new java.io.File(srcStreamDir).mkdirs()
    val schema = spark.read.parquet(chunkDir(0)).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcStreamDir)
    val deduped = StreamingDedup.dropDuplicatesWithinDelay(
      src, "text", "ts", s"$delaySec seconds", _ => col("fp"))
      .select($"doc_id", $"fp", $"ts")
    val q = deduped.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode("append")
      .start()

    val batchWall = new scala.collection.mutable.ArrayBuffer[Double]
    val stateRows = new scala.collection.mutable.ArrayBuffer[Long]
    try {
      chunkFiles.zipWithIndex.foreach { case (f, b) =>
        val t0 = System.nanoTime()
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(srcStreamDir, f"chunk$b%03d.parquet"))
        q.processAllAvailable()
        batchWall += (System.nanoTime() - t0) / 1e9
        stateRows += Option(q.lastProgress)
          .flatMap(p => p.stateOperators.headOption)
          .map(_.numRowsTotal).getOrElse(-1L)
      }
    } finally q.stop()

    // --------------------------- the oracle ---------------------------
    val out = spark.read.parquet(outDir)
    val perFp = out.groupBy($"fp").agg(count(lit(1)).as("emits")).persist()

    // fps planted as WITHIN duplicates: origin wave b-1 via doc_id%25==3
    // (every wave except the last is some wave's within-origin)
    val withinDocs = docs.where($"doc_id" % 25 === 3).select($"doc_id")
    val withinFps = (0 until batches - 1).map { origin =>
      withinDocs.withColumn("fp", xxhash64($"doc_id", lit(origin)))
    }.reduce(_ unionAll _).select($"fp")
    val reemitDocs = docs.where($"doc_id" % 25 === 7).select($"doc_id")
    val reemitFps = (0 until batches - reemitGap).map { origin =>
      reemitDocs.withColumn("fp", xxhash64($"doc_id", lit(origin)))
    }.reduce(_ unionAll _).select($"fp")

    val withinBad = perFp.join(withinFps, Seq("fp"))
      .where($"emits" =!= 1).count()
    val reemitBad = perFp.join(reemitFps, Seq("fp"))
      .where($"emits" =!= 2).count()
    // everything not planted is a singleton: exactly one emission
    val singletonBad = perFp
      .join(withinFps, Seq("fp"), "left_anti")
      .join(reemitFps, Seq("fp"), "left_anti")
      .where($"emits" =!= 1).count()
    val distinctFps = nDocs * batches
    val emittedFps = perFp.count()
    perFp.unpersist()

    // state bound: keys live ~ delay + one-wave watermark lag →
    // ceil(delay/60)+2 waves of keys; generous 2× slack on top, and
    // still an order of magnitude under the feed's distinct-key count
    val horizonWaves = delaySec / 60 + 2
    val stateBound = nDocs * horizonWaves * 2
    val maxState = stateRows.max
    val stateOk = maxState > 0 && maxState <= stateBound
    // flatness: steady-state tail no slower than the early steady
    // batches (first two absorb sink/JIT warmup) beyond noise
    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val early = median(batchWall.slice(2, 7).toSeq)
    val late = median(batchWall.takeRight(5).toSeq)
    val flatOk = late <= early * 3 + 0.5

    val semOk = withinBad == 0 && reemitBad == 0 && singletonBad == 0 &&
      emittedFps == distinctFps
    val pass = semOk && stateOk && flatOk
    val nWithin = withinDocs.count()
    val nReemit = reemitDocs.count()
    println(
      s"""{"probe":"stream_scale","batches":$batches,"events":${nDocs * batches + (batches - 1) * nWithin + (batches - reemitGap) * nReemit},""" +
      s""""distinct_fps":$distinctFps,"emitted_fps":$emittedFps,""" +
      s""""within_bad":$withinBad,"reemit_bad":$reemitBad,"singleton_bad":$singletonBad,""" +
      s""""max_state_rows":$maxState,"state_bound":$stateBound,""" +
      s""""early_batch_s":$early,"late_batch_s":$late,""" +
      s""""pass":$pass}""")
    graft.util.Files.deleteRecursively(new java.io.File(root))
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
