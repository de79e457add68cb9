package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.RecallProtocol

/** Sustained-maintenance probe for the mutable index kinds — the gates
  * prove ONE append round and ONE delete each; nothing proved an index
  * stays healthy through many interleaved maintenance cycles, which is
  * what a 100 TB deployment actually does to it. Per kind
  * (hnsw, ivf, ivfpq, pq, bq, mrl), one artifact lives through `rounds` cycles
  * of: append a fresh 2k-vector wave → tombstone a deterministic slice
  * of an OLD wave → every 4th round consolidate. After every round the
  * probe asserts, against exact brute-force truth over the CURRENT
  * live set (waves appended so far minus everything deleted):
  *
  *  - serving recall@10 ≥ 0.8 for 20 held-out queries — appended rows
  *    are searchable immediately, and quality does not decay as the
  *    artifact accumulates deltas and tombstones;
  *  - NO deleted id is ever returned, through every round (masking
  *    between consolidations, physical absence after);
  *  - after each consolidate: the kind's `validateIndex` passes
  *    against the live source (codec bit-identity on the rebuilt
  *    artifact) and its stored-row count equals the live count
  *    (tombstones applied physically, nothing lost);
  *  - the artifact file count is strictly REDUCED by consolidation
  *    whenever deltas accumulated, and its post-consolidate baseline
  *    never grows beyond geometry (corpus growth), i.e. the layout is
  *    bounded by maintenance, not by stream length.
  *
  * The corpus is derived from sf embeddings: wave w = ids shifted by
  * w·2^20, elements jittered ±0.05 by a seeded hash — deterministic,
  * so the live set is re-derivable exactly at every round.
  *
  * Usage: runMain graft.tools.IndexMaintenanceProbe [srcSfDir] [rounds] [kinds]
  */
object IndexMaintenanceProbe {

  private val IdOff = 1L << 20

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(12)
    val kinds = args.lift(2).getOrElse("hnsw,ivf,ivfpq,pq,bq,mrl")
      .split(",").toSeq
    val initialWaves = 3
    val consolidateEvery = 4
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

    val base = spark.read.parquet(s"$srcDir/embeddings.parquet")
      .select($"vec_id", $"embedding")

    def wave(w: Int): DataFrame = base.select(
      ($"vec_id" + lit(w * IdOff)).as("id"),
      expr(s"transform(embedding, (x, i) -> cast(x + " +
        s"(pmod(xxhash64(vec_id, $w, i), 1000) - 500) / 10000.0 as float))")
        .as("vec"))

    // deterministic delete slice for round r: 1/20th of wave r-1
    // (always an already-present wave: rounds are 1-based and
    // initialWaves ≥ 1) — old rows, the realistic retention shape
    def deleteSlice(r: Int): DataFrame =
      wave(r - 1).where($"id" % 20 === 5).select($"id")

    val queries: Array[(Long, Array[Float])] = wave(777)
      .orderBy($"id").limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val queriesDf = queries.toSeq.toDF("query_id", "qv")

    def countFiles(path: String): Int = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0
      else {
        val it = fs.listFiles(p, true)
        var n = 0
        while (it.hasNext) {
          val f = it.next()
          if (!f.getPath.getName.startsWith("_")) n += 1
        }
        n
      }
    }

    final case class KindOps(
        name: String,
        build: (DataFrame, String) => Unit,
        append: (DataFrame, String) => Unit,
        delete: (String, Seq[Long]) => Unit,
        consolidate: String => Unit,
        validate: (String, DataFrame) => Long,
        // search's DataFrame is the FULL corpus (deleted rows still
        // present) — the realistic rerank source (a user deletes from
        // the index before the table catches up), and the shape that
        // makes the deleted-id check real: a leaked tombstone must
        // SURFACE in results, not be silently laundered out by a
        // rerank join against an already-clean table
        search: (String, DataFrame) => DataFrame)

    def ops(name: String): KindOps = name match {
      case "hnsw" =>
        import graft.ann.{AnnIndex, AnnParams}
        KindOps("hnsw",
          (df, p) => { AnnIndex.build(df, "id", "vec", p,
            AnnParams(m = 16, efConstruction = 100, ef = 128,
              numPartitions = 4)); () },
          (b, p) => AnnIndex.append(b, "id", "vec", p),
          (p, ids) => AnnIndex.delete(spark, p, ids),
          p => AnnIndex.consolidate(spark, p, numPartitions = 4),
          (p, live) => AnnIndex.validateIndex(spark, p,
            source = Some((live, "id", "vec"))),
          (p, _) => AnnIndex.searchMany(spark, p, queries.toSeq, k = 10,
            efOverride = 192))
      case "ivf" =>
        import graft.ann.IvfIndex
        KindOps("ivf",
          (df, p) => IvfIndex.build(df, "id", "vec", p, nlists = 32),
          (b, p) => IvfIndex.append(b, "id", "vec", p),
          (p, ids) => IvfIndex.delete(spark, p, ids),
          p => IvfIndex.consolidate(spark, p),
          (p, live) => IvfIndex.validateIndex(spark, p,
            source = Some((live, "id", "vec"))),
          (p, _) => IvfIndex.searchMany(spark, p, queries.toSeq, k = 10,
            nprobe = 16))
      case "ivfpq" =>
        import graft.ann.IvfPqIndex
        KindOps("ivfpq",
          (df, p) => IvfPqIndex.build(df, "id", "vec", p, nlists = 32,
            subvectors = 8, clusters = 64),
          (b, p) => IvfPqIndex.append(b, "id", "vec", p),
          (p, ids) => IvfPqIndex.delete(spark, p, ids),
          p => IvfPqIndex.consolidate(spark, p),
          (p, live) => IvfPqIndex.validateIndex(spark, p,
            source = Some((live, "id", "vec"))),
          (p, corpus) => IvfPqIndex.searchMany(spark, p, queries.toSeq,
            k = 10, nprobe = 16, ef = 512,
            rerank = Some((corpus, "id", "vec"))))
      case "pq" =>
        import graft.ann.{AnnParams, PqAnnIndex}
        import graft.pq.ProductQuantizer
        KindOps("pq",
          (df, p) => {
            val cb = ProductQuantizer.trainCodebook(
              df, "vec", subvectors = 8, clusters = 64)
            PqAnnIndex.build(df, "id", "vec", p, cb,
              AnnParams(m = 16, efConstruction = 100, ef = 128,
                numPartitions = 4))
          },
          (b, p) => PqAnnIndex.append(b, "id", "vec", p),
          (p, ids) => PqAnnIndex.delete(spark, p, ids),
          p => PqAnnIndex.consolidate(spark, p, numPartitions = 4),
          (p, live) => PqAnnIndex.validateIndex(spark, p,
            source = Some((live, "id", "vec"))),
          (p, corpus) => PqAnnIndex.searchMany(spark, p, queries.toSeq,
            k = 10, ef = 512, rerank = Some((corpus, "id", "vec"))))
      case "bq" =>
        import graft.ann.BqIndex
        KindOps("bq",
          (df, p) => BqIndex.build(df, "id", "vec", p),
          (b, p) => BqIndex.append(b, "id", "vec", p),
          (p, ids) => BqIndex.delete(spark, p, ids),
          p => BqIndex.consolidate(spark, p, numPartitions = 4),
          (p, live) => BqIndex.validateIndex(live, "id", "vec", p),
          (p, corpus) => graft.ops.BqSearch.topKManyPrepacked(
            BqIndex.liveBits(spark, p), "id", "bits",
            corpus, "vec", queries.toSeq, k = 10, pool = 384,
            center = BqIndex.center(spark, p)))
      case "mrl" =>
        import graft.ann.MrlIndex
        KindOps("mrl",
          (df, p) => MrlIndex.build(df, "id", "vec", m = 32, path = p),
          (b, p) => MrlIndex.append(b, "id", "vec", p),
          (p, ids) => MrlIndex.delete(spark, p, ids),
          p => MrlIndex.consolidate(spark, p, numPartitions = 4),
          (p, live) => MrlIndex.validateIndex(spark, p,
            source = Some((live, "id", "vec"))),
          (p, corpus) => graft.ops.MrlSearch.topKManyPrepacked(
            MrlIndex.livePrefixes(spark, p), "id", "pref",
            corpus, "vec", queries.toSeq, k = 10, pool = 192, m = 32))
      case other =>
        throw new IllegalArgumentException(s"unknown kind '$other'")
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft-maint-probe").toString
    var allPass = true

    kinds.foreach { kindName =>
      val kind = ops(kindName)
      val path = s"$root/${kind.name}"
      val t0 = System.nanoTime()

      val initial = (0 until initialWaves).map(wave).reduce(_ unionAll _)
      kind.build(initial, path)

      var deleted = Seq.empty[Long]
      var minRecall = 1.0
      var tombstoneLeaks = 0L
      var validateErr: Option[String] = None
      var consolidateNonReducing = 0
      var postConsolidateCounts = List.empty[Int]
      val fileCounts = new scala.collection.mutable.ArrayBuffer[Int]

      (1 to rounds).foreach { r =>
        kind.append(wave(initialWaves + r - 1), path)
        val delIds = deleteSlice(r).as[Long].collect().toSeq
        kind.delete(path, delIds)
        deleted = deleted ++ delIds

        val preCount = countFiles(path)
        val didConsolidate = r % consolidateEvery == 0
        if (didConsolidate) {
          kind.consolidate(path)
          val post = countFiles(path)
          if (post >= preCount) consolidateNonReducing += 1
          postConsolidateCounts ::= post
        }
        fileCounts += countFiles(path)

        val deletedDf = deleted.toDF("id")
        val corpus = (0 until initialWaves + r).map(wave)
          .reduce(_ unionAll _)
        val live = corpus.join(deletedDf, Seq("id"), "left_anti")

        val annDf = kind.search(path, corpus)
        val ann = RecallProtocol.perQueryDf(annDf)
        val exact = RecallProtocol.perQueryDf(
          graft.ops.VectorSearch.knnJoinExact(
            queriesDf, "query_id", "qv", live, "id", "vec", 10, "l2sq"))
        val recall = RecallProtocol.meanRecall(ann, exact)
        minRecall = math.min(minRecall, recall)
        val leaked = ann.valuesIterator.flatten.toSet
          .intersect(deleted.toSet).size
        tombstoneLeaks += leaked

        if (didConsolidate && validateErr.isEmpty) {
          try {
            val stored = kind.validate(path, live)
            val liveN = live.count()
            if (stored != liveN)
              validateErr = Some(
                s"round $r: stored $stored != live $liveN after consolidate")
          } catch {
            case e: IllegalStateException => validateErr = Some(
              s"round $r: ${e.getMessage}")
          }
        }
        println(f"[maint-probe] ${kind.name}%-6s round $r%2d " +
          f"recall=$recall%.3f leaks=$leaked files=${fileCounts.last}" +
          (if (didConsolidate) " (consolidated)" else ""))
      }

      // the post-consolidate baseline may grow with the corpus (more
      // data partitions) but must stay within small geometry of the
      // first cycle's — 4x guards against delta leakage across cycles
      val baselineOk = postConsolidateCounts.reverse match {
        case first :: rest => rest.forall(_ <= first * 4)
        case Nil => true
      }
      val pass = minRecall >= 0.8 && tombstoneLeaks == 0 &&
        validateErr.isEmpty && consolidateNonReducing == 0 && baselineOk
      allPass &&= pass
      println(
        s"""{"probe":"index_maintenance","kind":"${kind.name}","rounds":$rounds,""" +
        s""""min_recall":$minRecall,"tombstone_leaks":$tombstoneLeaks,""" +
        s""""validate_err":${validateErr.map("\"" + _.replace("\"", "'") + "\"").getOrElse("null")},""" +
        s""""consolidate_non_reducing":$consolidateNonReducing,""" +
        s""""post_consolidate_files":[${postConsolidateCounts.reverse.mkString(",")}],""" +
        s""""max_files":${fileCounts.max},"wall_s":${(System.nanoTime() - t0) / 1e9},""" +
        s""""pass":$pass}""")
    }

    graft.util.Files.deleteRecursively(new java.io.File(root))
    spark.stop()
    if (!allPass) sys.exit(1)
  }
}
