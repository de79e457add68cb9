package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ann.{AnnIndex, AnnParams}
import graft.functions.l2sq_dist

/** Driver-checkable queries for the ANN index path (SURVEY.md §2.2).
  *
  * HNSW results are seed/order dependent, so they can never be
  * hash-compared row-for-row (the reference gates them on recall too —
  * test/sql/utils/calculate_recall.sql:1-48). The contract here:
  * compute recall@10 of the distributed ANN search against the exact
  * top-k and emit a row only when recall ≥ 0.8; the oracle is the
  * constant row. A hash match therefore *is* the recall gate.
  */
object AnnQueries {

  /** Build-once helper for the gate queries: artifacts are a pure
    * function of (source data, params) — a _GRAFT_SUCCESS marker makes
    * reuse safe against interrupted builds, and the cache path embeds a
    * fingerprint of the source parquet (length + mtime) so regenerated
    * test data can never serve a stale index. */
  private[queries] def artifactDir(tag: String, dir: String, table: String): String = {
    // fingerprint must reflect CONTENTS: for a parquet directory, the
    // directory inode's length/mtime are meaningless — fold in every
    // child file's (name, length, mtime) instead
    def fp(f: java.io.File): Long =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName)
          .foldLeft(17L)((acc, c) => acc * 31 + fp(c))
      else f.getName.hashCode.toLong * 31 + f.length() * 31 + f.lastModified()
    val src = new java.io.File(s"$dir/$table.parquet")
    val h = Integer.toHexString((dir.hashCode.toLong * 31 + fp(src)).toInt)
    new java.io.File(sys.props("java.io.tmpdir"), s"graft-$tag-$h/idx").toString
  }

  private[queries] def cached(path: String)(build: => Unit): Unit = {
    val marker = new java.io.File(path, "_GRAFT_SUCCESS")
    if (!marker.exists()) {
      build
      marker.createNewFile()
      ()
    }
  }

  private def annRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val path = artifactDir("ann", dir, "embeddings")
    cached(path) {
      AnnIndex.build(e, "vec_id", "embedding", path,
        AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))
    }

    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val ann = AnnIndex.search(s, path, q, 10).map(_._1).toSet
    val exact = e
      .withColumn("d", l2sq_dist(col("embedding"), lit(q)))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = ann.intersect(exact).size.toDouble / exact.size
    if (recall >= 0.8) Seq(1).toDF("ok") else Seq.empty[Int].toDF("ok")
  }

  /** Streaming ingestion into a live index — build from the first half
    * of the table, stream the second half through the FILE source
    * (3 vec_id-range parquet chunk files, `readStream` +
    * `maxFilesPerTrigger 1` — no driver materialization of the stream
    * input) into `foreachBatch` → `AnnIndex.append` (the daemon's
    * aminsert path, delta shards per micro-batch), then recall-gate a
    * search over the COMPLETE corpus: streamed rows must be as
    * findable as built rows. Fresh artifact per invocation (appends
    * mutate it — a cached artifact would double-append under bench
    * reps). */
  private def streamingAnnInsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val path = java.nio.file.Files
      .createTempDirectory("graft-sann").toString + "/idx"
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    AnnIndex.build(e.where(col("vec_id") <= maxId / 2), "vec_id", "embedding",
      path, AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))

    val base = e.where(col("vec_id") > maxId / 2)
      .select(col("vec_id"), col("embedding"))
    val lo = maxId / 2 + 1
    val width = (maxId - lo) / 3 + 1
    val chunkRoot = artifactDir("sannins", dir, "embeddings")
    val files = StreamChunks.materialize(chunkRoot,
      (0 until 3).map { c => () =>
        base.where(col("vec_id") >= lo + c * width &&
          col("vec_id") < lo + (c + 1) * width)
      })
    val (streamDir, src) = StreamChunks.source(s, base.schema)
    val q = src.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) AnnIndex.append(b, "vec_id", "embedding", path)
      }
      .start()
    StreamChunks.drive(q, streamDir, files)

    val qv = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val ann = AnnIndex.search(s, path, qv, 10).map(_._1).toSet
    val exact = e
      .withColumn("d", l2sq_dist(col("embedding"), lit(qv)))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = ann.intersect(exact).size.toDouble / exact.size
    // streamed rows must actually surface: at least one of the exact
    // top-10 has to come from the streamed id range
    val streamedFound = ann.exists(_ > maxId / 2) || exact.forall(_ <= maxId / 2)
    if (recall >= 0.8 && streamedFound) Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  /** Same recall gate, but through the PLANNER: the table is registered
    * in AnnCatalog and the query is plain `orderBy(dist).limit(k)` — a
    * row is emitted only if the optimizer actually rewrote the plan to
    * an AnnScan AND its candidates reach recall ≥ 0.8. This is the
    * driver-checked analog of the reference's has_index_scan() EXPLAIN
    * assertions (test/sql/hnsw_select.sql:21-72).
    */
  private def annPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.{AnnCatalog, AnnScanLogical}
    val e = Tables.embeddings(s, dir)
    val path = artifactDir("annp", dir, "embeddings")
    cached(path) {
      AnnIndex.build(e, "vec_id", "embedding", path,
        AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))
    }
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = 64))
    try {
      val knn = e.select(col("vec_id"), col("embedding"))
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      val usedIndex = knn.queryExecution.optimizedPlan.collect {
        case a: AnnScanLogical => a
      }.nonEmpty
      val ann = knn.select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val recall = ann.intersect(exact).size.toDouble / exact.size
      if (usedIndex && recall >= 0.8) Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally AnnCatalog.unregister(s, tablePath)
  }

  /** Filtered-search gate (`WHERE pred ORDER BY dist LIMIT k` through
    * the index — the reference's post-filter streaming scan,
    * scan.c:332-333). Two sub-gates on one index artifact:
    *  1. a 1-in-3 predicate: adaptive over-fetch must reach recall@10
    *     ≥ 0.8 vs the exact FILTERED top-10;
    *  2. a starving predicate keeping < k rows: the exact fallback must
    *     return exactly the surviving rows (no starvation, the
    *     LIMIT-starvation case the planner rule refuses to gamble on).
    */
  private def annFiltered(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val path = artifactDir("ann", dir, "embeddings")
    cached(path) {
      AnnIndex.build(e, "vec_id", "embedding", path,
        AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))
    }
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray

    val pred = col("vec_id") % 3 === 0
    val got = AnnIndex
      .searchFiltered(e, "vec_id", "embedding", path, q, 10, pred)
      .map(_._1).toSet
    val exact = e.where(pred)
      .withColumn("d", l2sq_dist(col("embedding"), lit(q)))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size

    val starvingPred = col("vec_id") < 3 // < k survivors
    val gotStarved = AnnIndex
      .searchFiltered(e, "vec_id", "embedding", path, q, 10, starvingPred)
      .map(_._1).toSet
    val allSurvivors = e.where(starvingPred)
      .select("vec_id").collect().map(_.getLong(0)).toSet

    if (recall >= 0.8 && gotStarved == allSurvivors) Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  /** Filtered search through the PLANNER: plain
    * `where(pred).orderBy(dist).limit(k)` — NOT the explicit operator —
    * must (a) rewrite to the AnnFilteredIds scan (the reference keeps
    * the index under a WHERE and post-filters: scan.c:332-333, asserted
    * by test/sql/hnsw_select.sql:52-53), (b) reach recall@10 ≥ 0.8 vs
    * the exact filtered top-10, and (c) return exactly the surviving
    * rows for a starving predicate via the execution-time exact
    * fallback. */
  private def annFilteredPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.{AnnCatalog, AnnFilteredIdsLogical}
    val e = Tables.embeddings(s, dir)
    val path = artifactDir("ann", dir, "embeddings")
    cached(path) {
      AnnIndex.build(e, "vec_id", "embedding", path,
        AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))
    }
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = 64))
    try {
      def usesIndex(df: DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collect {
          case a: AnnFilteredIdsLogical => a
        }.nonEmpty

      val pred = col("vec_id") % 3 === 0
      val knn = e.where(pred)
        .orderBy(graft.functions.l2sq_dist(col("embedding"), lit(q))).limit(10)
      val got = knn.select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = e.where(pred)
        .withColumn("d", l2sq_dist(col("embedding"), lit(q)))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val recall = got.intersect(exact).size.toDouble / exact.size

      val starvingPred = col("vec_id") < 3
      val sknn = e.where(starvingPred)
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      val sGot = sknn.select("vec_id").collect().map(_.getLong(0)).toSet
      val survivors = e.where(starvingPred)
        .select("vec_id").collect().map(_.getLong(0)).toSet

      if (usesIndex(knn) && usesIndex(sknn) &&
          got.forall(_ % 3 == 0) && recall >= 0.8 && sGot == survivors)
        Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally AnnCatalog.unregister(s, tablePath)
  }

  /** Batch kNN-join gate (`searchMany` — the LATERAL analog,
    * test/sql/hnsw_select.sql:66-69): every outer row's ANN top-3 must
    * reach mean recall@3 ≥ 0.8 vs the exact `knnJoinExact` oracle, and
    * every outer row must be answered. One pass over the shards for
    * ALL queries — the kNN-join scale path. */
  private def knnJoinAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val data = e.where(col("vec_id") >= 5)
    val path = artifactDir("annjoin", dir, "embeddings")
    cached(path) {
      AnnIndex.build(data, "vec_id", "embedding", path,
        AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))
    }
    val queries = e.where(col("vec_id") < 5)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    def perQuery(rows: Array[(Long, Long)]): Map[Long, Set[Long]] =
      rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ann = perQuery(AnnIndex
      .searchMany(s, path, queries, k = 3, efOverride = 64)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))))
    val exact = perQuery(graft.ops.VectorSearch.knnJoinExact(
        e.where(col("vec_id") < 5), "vec_id", "embedding",
        data, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))))
    val recalls = exact.map { case (qid, ex) =>
      ann.getOrElse(qid, Set.empty[Long]).intersect(ex).size.toDouble / ex.size
    }
    val meanRecall = recalls.sum / recalls.size
    if (ann.keySet == exact.keySet && meanRecall >= 0.8) Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  /** Planner-level lateral kNN-join gate: the reference's LATERAL SQL
    * form (test/sql/hnsw_select.sql:66-69) — which vanilla Spark
    * REJECTS at analysis (no outer references under ORDER BY) — must
    * (a) analyze AND plan through [[graft.plans.AnnKnnJoinLogical]]
    * (the batched `searchMany` path), and (b) reach mean per-outer-row
    * recall@3 ≥ 0.8 vs the exact kNN join, with every outer row
    * answered. */
  private def knnJoinPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.AnnCatalog
    val e = Tables.embeddings(s, dir)
    val path = artifactDir("ann", dir, "embeddings")
    cached(path) {
      AnnIndex.build(e, "vec_id", "embedding", path,
        AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))
    }
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = 64))
    val view = "graft_kjp_emb"
    e.createOrReplaceTempView(view)
    try {
      val q = s.sql(
        s"""SELECT p.vec_id AS query_id, t.vec_id AS neighbor_id
           |FROM (SELECT vec_id, embedding FROM $view WHERE vec_id < 5) p,
           |LATERAL (
           |  SELECT vec_id FROM $view
           |  ORDER BY l2sq_dist(embedding, p.embedding) LIMIT 3
           |) t""".stripMargin)
      val planned = q.queryExecution.optimizedPlan.collect {
        case a: graft.plans.AnnKnnJoinLogical => a
      }.nonEmpty
      def perQuery(rows: Array[(Long, Long)]): Map[Long, Set[Long]] =
        rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val ann = perQuery(q.collect()
        .map(r => (r.getLong(0), r.getLong(1))))
      val exact = perQuery(graft.ops.VectorSearch.knnJoinExact(
          e.where(col("vec_id") < 5), "vec_id", "embedding",
          e, "vec_id", "embedding", k = 3)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))))
      val recalls = exact.map { case (qid, ex) =>
        ann.getOrElse(qid, Set.empty[Long]).intersect(ex).size.toDouble / ex.size
      }
      val meanRecall = recalls.sum / recalls.size
      if (planned && ann.keySet == exact.keySet && meanRecall >= 0.8)
        Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally {
      AnnCatalog.unregister(s, tablePath)
      s.catalog.dropTempView(view)
      ()
    }
  }

  /** Shared body of the non-hnsw lateral gates: register `meta` for the
    * embeddings table, run the reference's LATERAL SQL shape, and
    * require (a) the plan routed through AnnKnnJoinLogical with the
    * expected index kind and (b) mean per-outer-row recall@3 ≥ 0.8 vs
    * the exact kNN join with every outer row answered. */
  private def lateralGateFor(s: SparkSession, dir: String,
      meta: graft.plans.AnnCatalog.IndexMeta, view: String): DataFrame = {
    import s.implicits._
    import graft.plans.AnnCatalog
    val e = Tables.embeddings(s, dir)
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(s, tablePath, meta)
    e.createOrReplaceTempView(view)
    try {
      val q = s.sql(
        s"""SELECT p.vec_id AS query_id, t.vec_id AS neighbor_id
           |FROM (SELECT vec_id, embedding FROM $view WHERE vec_id < 5) p,
           |LATERAL (
           |  SELECT vec_id FROM $view
           |  ORDER BY l2sq_dist(embedding, p.embedding) LIMIT 3
           |) t""".stripMargin)
      val planned = q.queryExecution.optimizedPlan.collect {
        case a: graft.plans.AnnKnnJoinLogical if a.kind == meta.kind => a
      }.nonEmpty
      def perQuery(rows: Array[(Long, Long)]): Map[Long, Set[Long]] =
        rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val ann = perQuery(q.collect().map(r => (r.getLong(0), r.getLong(1))))
      val exact = perQuery(graft.ops.VectorSearch.knnJoinExact(
          e.where(col("vec_id") < 5), "vec_id", "embedding",
          e, "vec_id", "embedding", k = 3)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))))
      // micro-averaged (integer hits / integer total): per-query double
      // sums can land a true 12/15 = 0.8 at 0.7999999999999999
      val hits = exact.iterator.map { case (qid, ex) =>
        ann.getOrElse(qid, Set.empty[Long]).intersect(ex).size
      }.sum
      val total = exact.valuesIterator.map(_.size).sum
      if (planned && ann.keySet == exact.keySet &&
          hits.toDouble >= 0.8 * total)
        Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally {
      AnnCatalog.unregister(s, tablePath)
      s.catalog.dropTempView(view)
      ()
    }
  }

  /** Lateral kNN join through an IVF index: the same LATERAL SQL the
    * hnsw gate runs must plan through AnnKnnJoinLogical(kind=ivf) —
    * ONE partition-pruned pass over the union of the probed lists for
    * all outer rows — and hold the recall contract. */
  private def knnJoinIvfPlanner(s: SparkSession, dir: String): DataFrame = {
    import graft.ann.IvfIndex
    val e = Tables.embeddings(s, dir)
    val path = artifactDir("ivf", dir, "embeddings")
    cached(path) {
      IvfIndex.build(e, "vec_id", "embedding", path, nlists = 16)
    }
    lateralGateFor(s, dir,
      graft.plans.AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq",
        ef = 64, kind = "ivf", nprobe = 12),
      view = "graft_kjp_ivf")
  }

  /** Lateral kNN join through an IVF-PQ index: batched residual-LUT
    * scoring over probed code lists, LUT pool exact-reranked against
    * the table's true floats in one broadcast join-back. */
  private def knnJoinIvfPqPlanner(s: SparkSession, dir: String): DataFrame = {
    import graft.ann.IvfPqIndex
    val e = Tables.embeddings(s, dir)
    val path = artifactDir("ivfpq", dir, "embeddings")
    cached(path) {
      IvfPqIndex.build(e, "vec_id", "embedding", path,
        nlists = 16, subvectors = 8, clusters = 64)
    }
    lateralGateFor(s, dir,
      graft.plans.AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq",
        ef = 256, kind = "ivfpq", nprobe = 8),
      view = "graft_kjp_ivfpq")
  }

  /** Lateral kNN join through an in-graph PQ index: batched per-query
    * LUT graph search in one pass over the code shards, pool
    * exact-reranked against the table's true floats. */
  private def knnJoinPqPlanner(s: SparkSession, dir: String): DataFrame = {
    import graft.ann.{AnnParams, PqAnnIndex}
    import graft.pq.ProductQuantizer
    val e = Tables.embeddings(s, dir)
    val path = artifactDir("pqann", dir, "embeddings")
    cached(path) {
      val cb = ProductQuantizer.trainCodebook(
        e, "embedding", subvectors = 8, clusters = 64)
      PqAnnIndex.build(e, "vec_id", "embedding", path, cb,
        AnnParams(m = 16, efConstruction = 128, ef = 128, numPartitions = 4))
    }
    lateralGateFor(s, dir,
      graft.plans.AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq",
        ef = 256, kind = "pq"),
      view = "graft_kjp_pq")
  }

  /** Lateral kNN join under the HAMMING metric: probes carry the
    * table's b1-packed array<int>, the rule word-packs each probe to
    * match shard layout, and — as in `knn_hamming_ann` — the tie-robust
    * criterion is the per-probe sorted DISTANCE multiset matching the
    * exact top-k exactly (64-bit signatures tie massively, so id
    * recall is not well-defined). */
  private def knnJoinHammingPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.{AnnIndex, AnnParams}
    import graft.functions.hamming_dist
    import graft.pq.ScalarQuantizer
    import graft.plans.AnnCatalog
    val e = Tables.embeddings(s, dir)
    // materialize the b1 table as parquet — AnnCatalog registration and
    // the lateral SQL both address a storage path
    val tblRoot = artifactDir("hamtbl", dir, "embeddings")
    cached(tblRoot) {
      e.select(col("vec_id"),
          ScalarQuantizer.quantize_b1(col("embedding")).as("bits"))
        .write.mode("overwrite").parquet(s"$tblRoot/tbl")
    }
    val tablePath = s"$tblRoot/tbl"
    val b1 = s.read.parquet(tablePath)
    val path = artifactDir("annh", dir, "embeddings")
    cached(path) {
      AnnIndex.build(b1, "vec_id", "bits", path,
        AnnParams(m = 16, efConstruction = 128, ef = 128,
          metric = "hamming", numPartitions = 4))
    }
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "bits", "hamming", ef = 128))
    val view = "graft_kjp_ham"
    b1.createOrReplaceTempView(view)
    try {
      val q = s.sql(
        s"""SELECT p.vec_id AS query_id, t.vec_id AS neighbor_id
           |FROM (SELECT vec_id, bits FROM $view WHERE vec_id < 5) p,
           |LATERAL (
           |  SELECT vec_id FROM $view
           |  ORDER BY hamming_dist(bits, p.bits) LIMIT 3
           |) t""".stripMargin)
      val planned = q.queryExecution.optimizedPlan.collect {
        case a: graft.plans.AnnKnnJoinLogical if a.metric == "hamming" => a
      }.nonEmpty
      val ann = q.collect().map(r => (r.getLong(0), r.getLong(1)))
      val bitsById = b1.select("vec_id", "bits").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
      def hd(a: Array[Int], b: Array[Int]): Int =
        a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      val annDists = ann.groupBy(_._1).view.mapValues(_.map { case (qid, nid) =>
        hd(bitsById(qid), bitsById(nid))
      }.sorted.toSeq).toMap
      val probes = (0L until 5L).toSeq
      val exactDists = probes.map { qid =>
        qid -> b1
          .withColumn("hd", hamming_dist(col("bits"), lit(bitsById(qid))))
          .orderBy(col("hd"), col("vec_id")).limit(3)
          .select(col("hd").cast("int")).collect().map(_.getInt(0)).sorted.toSeq
      }.toMap
      if (planned && annDists == exactDists) Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally {
      AnnCatalog.unregister(s, tablePath)
      s.catalog.dropTempView(view)
      ()
    }
  }

  /** Catalog persistence gate: registrations survive a save → clear →
    * load cycle (the reference's index metadata lives in the PG
    * catalog and survives restarts; our registry is session state, so
    * the persisted file is the restart story). Emits its row only when
    * the cleared catalog stops the planner rewrite AND the loaded one
    * restores it with recall intact. */
  private def catalogPersist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.{AnnCatalog, AnnScanLogical}
    val e = Tables.embeddings(s, dir)
    val path = artifactDir("ann", dir, "embeddings")
    cached(path) {
      AnnIndex.build(e, "vec_id", "embedding", path,
        AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))
    }
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val tablePath = s"$dir/embeddings.parquet"
    val catFile = java.nio.file.Files
      .createTempDirectory("graft-catp").toString + "/catalog.json"
    try {
      AnnCatalog.register(s, tablePath,
        AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = 64))
      AnnCatalog.save(s, catFile)
      AnnCatalog.unregister(s, tablePath)
      def knn = e.select(col("vec_id"), col("embedding"))
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      def planned = knn.queryExecution.optimizedPlan.collect {
        case a: AnnScanLogical => a
      }.nonEmpty
      val offWhileCleared = !planned
      val loaded = AnnCatalog.load(s, catFile) == 1
      val onAfterLoad = planned
      val ann = knn.select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val recall = ann.intersect(exact).size.toDouble / exact.size
      if (offWhileCleared && loaded && onAfterLoad && recall >= 0.8)
        Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally AnnCatalog.unregister(s, tablePath)
  }

  /** Autotune gate (`autotune-index`, index_autotune/mod.rs:280-526):
    * a deterministic run (hash-sampled queries, fixed build seeds)
    * over the reference's six-variant grid, persisted as a report. A
    * row is emitted only when the RECORDED report obeys the selection
    * rule — all six variants measured, exactly one picked, the pick is
    * the first cost-ordered variant meeting the target and every
    * cheaper variant measurably missed it — and the promoted
    * (create-best) index actually answers searches. Report + index are
    * cached per dataset: six HNSW builds are the expensive part and
    * re-measuring them each bench rep would swamp the bench. */
  private def autotunePick(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.Autotune
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val target = 0.9
    val idxPath = artifactDir("autot", dir, "embeddings")
    val reportPath = idxPath + "-report"
    cached(idxPath) {
      val report = Autotune.autotuneCreate(e, "vec_id", "embedding", idxPath,
        targetRecall = target, queryCount = 5)
      Autotune.reportDf(s, report).write.mode("overwrite").parquet(reportPath)
    }
    val rep = s.read.parquet(reportPath).collect().map { r =>
      (r.getAs[Int]("m"), r.getAs[Int]("ef_construction"), r.getAs[Int]("ef")) ->
        ((r.getAs[Double]("recall"), r.getAs[Boolean]("picked")))
    }.toMap
    val grid = Autotune.DefaultGrid
    val ruleOk = rep.size == grid.size &&
      grid.forall(v => rep.contains((v.m, v.efConstruction, v.ef))) && {
        val inOrder = grid.map(v => rep((v.m, v.efConstruction, v.ef)))
        val recalls = inOrder.map(_._1)
        val picks = inOrder.map(_._2)
        val firstQualifying = recalls.indexWhere(_ >= target)
        firstQualifying >= 0 && picks.count(identity) == 1 &&
          picks(firstQualifying) &&
          recalls.take(firstQualifying).forall(_ < target)
      }
    val q = e.where(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0).toArray
    val served = AnnIndex.search(s, idxPath, q, 5).map(_._1).contains(7L)
    if (ruleOk && served) Seq(1).toDF("ok") else Seq.empty[Int].toDF("ok")
  }

  /** IVF recall gate: coarse-quantized partition-pruned search must
    * reach recall@10 ≥ 0.8 vs the exact oracle with half the lists
    * probed. */
  private def ivfRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.IvfIndex
    val e = Tables.embeddings(s, dir)
    val path = artifactDir("ivf", dir, "embeddings")
    cached(path) {
      IvfIndex.build(e, "vec_id", "embedding", path, nlists = 16)
    }
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val got = IvfIndex.search(s, path, q, 10, nprobe = 8)
      .select("id").collect().map(_.getLong(0)).toSet
    val exact = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    if (recall >= 0.8) Seq(1).toDF("ok") else Seq.empty[Int].toDF("ok")
  }

  /** Planner-level FILTERED IVF: `WHERE pred ORDER BY dist LIMIT k`
    * over an ivf-registered table must route through
    * AnnFilteredIdsLogical (not a silent exact scan), reach recall@10
    * ≥ 0.8 vs the exact filtered oracle, and stay EXACT when the
    * predicate starves the limit — the same contract as the hnsw
    * `knn_ann_filtered_planner` gate, for the coarse-list kind. */
  private def ivfFilteredPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.IvfIndex
    import graft.plans.{AnnCatalog, AnnFilteredIdsLogical}
    val e = Tables.embeddings(s, dir)
    val path = artifactDir("ivf", dir, "embeddings")
    cached(path) {
      IvfIndex.build(e, "vec_id", "embedding", path, nlists = 16)
    }
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = 64,
        kind = "ivf", nprobe = 8))
    try {
      def usesIndex(df: DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collect {
          case a: AnnFilteredIdsLogical if a.kind == "ivf" => a
        }.nonEmpty

      val pred = col("vec_id") % 3 === 0
      val knn = e.where(pred)
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      val got = knn.select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = e.where(pred)
        .withColumn("d", l2sq_dist(col("embedding"), lit(q)))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val recall = got.intersect(exact).size.toDouble / exact.size

      val starvingPred = col("vec_id") < 3
      val sknn = e.where(starvingPred)
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      val sGot = sknn.select("vec_id").collect().map(_.getLong(0)).toSet
      val survivors = e.where(starvingPred)
        .select("vec_id").collect().map(_.getLong(0)).toSet

      if (usesIndex(knn) && usesIndex(sknn) &&
          got.forall(_ % 3 == 0) && recall >= 0.8 && sGot == survivors)
        Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally AnnCatalog.unregister(s, tablePath)
  }

  /** Planner-level FILTERED IVF-PQ: same contract as the hnsw/ivf
    * filtered gates, through the compact-code kind — candidates from
    * the residual-LUT search, survivors re-ranked on the TABLE's true
    * floats inside the exec, widened ×4 per round, exact fallback. */
  private def ivfpqFilteredPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.IvfPqIndex
    import graft.plans.{AnnCatalog, AnnFilteredIdsLogical}
    val e = Tables.embeddings(s, dir)
    val path = artifactDir("ivfpq", dir, "embeddings")
    cached(path) {
      IvfPqIndex.build(e, "vec_id", "embedding", path,
        nlists = 16, subvectors = 8, clusters = 64)
    }
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = 256,
        kind = "ivfpq", nprobe = 8))
    try {
      def usesIndex(df: DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collect {
          case a: AnnFilteredIdsLogical if a.kind == "ivfpq" => a
        }.nonEmpty

      val pred = col("vec_id") % 3 === 0
      val knn = e.where(pred)
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      val got = knn.select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = e.where(pred)
        .withColumn("d", l2sq_dist(col("embedding"), lit(q)))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val recall = got.intersect(exact).size.toDouble / exact.size

      val starvingPred = col("vec_id") < 3
      val sknn = e.where(starvingPred)
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      val sGot = sknn.select("vec_id").collect().map(_.getLong(0)).toSet
      val survivors = e.where(starvingPred)
        .select("vec_id").collect().map(_.getLong(0)).toSet

      if (usesIndex(knn) && usesIndex(sknn) &&
          got.forall(_ % 3 == 0) && recall >= 0.8 && sGot == survivors)
        Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally AnnCatalog.unregister(s, tablePath)
  }

  /** IVF-PQ gate (the faiss `IVFPQ` layout — coarse lists + PQ
    * residual codes, Jégou et al. TPAMI 2011): the compact index
    * (codes only, no floats) with exact join-back rerank must reach
    * recall@10 ≥ 0.8 vs the exact oracle at half the lists probed,
    * every reranked distance must equal the TRUE l2sq distance, and
    * the stored rows must actually be codes (subvectors shorts, not
    * dim floats) — the compression claim is part of the gate. */
  private def ivfPqRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.IvfPqIndex
    val e = Tables.embeddings(s, dir)
    val path = artifactDir("ivfpq", dir, "embeddings")
    cached(path) {
      IvfPqIndex.build(e, "vec_id", "embedding", path,
        nlists = 16, subvectors = 8, clusters = 64)
    }
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    // rerank pool ef=256: 48-bit PQ codes on near-random data carry
    // real ADC noise, so the exact join-back re-ranks a deeper pool
    // (still k·P-scale rows, never a float scan)
    val got = IvfPqIndex.search(s, path, q, 10, nprobe = 8,
        rerank = Some((e, "vec_id", "embedding")), ef = 256)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id", "d").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val recall = got.map(_._1).toSet.intersect(exact.map(_._1).toSet)
      .size.toDouble / exact.length
    val exactById = exact.toMap
    val distsTrue = got.forall { case (id, d) =>
      exactById.get(id).forall(ed => math.abs(d - ed) < 1e-9)
    }
    val codesRow = s.read.parquet(s"$path/data").head()
    val codesCompact =
      codesRow.getSeq[Short](codesRow.fieldIndex("codes")).length == 8
    if (recall >= 0.8 && distsTrue && codesCompact) Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  /** Hamming-metric ANN gate (`dist_hamming_ops` analog,
    * lantern_hnsw/sql/lantern.sql:88-99): sign-quantize embeddings to
    * b1 packed bits, index under the hamming metric, and require the
    * ANN top-10 to match the exact top-10 ON DISTANCES. With 64-bit
    * signatures over thousands of rows the distance range is 0..64, so
    * the exact top-10 ID SET is not unique (massive tie groups at the
    * boundary) — the sorted distance multiset IS the tie-robust
    * correctness criterion, and matching it exactly is strictly
    * stronger than an 0.8 id-recall under ties.
    */
  private def hammingAnnRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.hamming_dist
    import graft.pq.ScalarQuantizer
    val e = Tables.embeddings(s, dir)
    def b1 = e.select(col("vec_id"),
      ScalarQuantizer.quantize_b1(col("embedding")).as("bits"))
    val path = artifactDir("annh", dir, "embeddings")
    cached(path) {
      AnnIndex.build(b1, "vec_id", "bits", path,
        AnnParams(m = 16, efConstruction = 128, ef = 128,
          metric = "hamming", numPartitions = 4))
    }
    val q = b1.where(col("vec_id") === 0).select("bits")
      .head().getSeq[Int](0).toArray
    val ann = AnnIndex.searchHamming(s, path, q, 10, efOverride = 128)
      .map(_._2).toSeq
    val exact = b1.withColumn("hd", hamming_dist(col("bits"), lit(q)))
      .orderBy(col("hd"), col("vec_id")).limit(10)
      .select(col("hd").cast("double")).collect().map(_.getDouble(0)).toSeq
    if (ann == exact) Seq(1).toDF("ok") else Seq.empty[Int].toDF("ok")
  }

  /** Inner-product (MIPS) metric across the whole index surface in one
    * gate: HNSW built under `inner`, IVF with l2-kmeans lists probed by
    * max centroid dot product (the faiss IVF-IP shape), and planner
    * routing of `orderBy(-inner_product).limit(k)` — all three must
    * reach recall@10 ≥ 0.8 vs the exact max-inner-product oracle, and
    * the planner query must actually rewrite to an AnnScan. */
  private def innerAnnRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.inner_product
    import graft.ann.IvfIndex
    import graft.plans.{AnnCatalog, AnnScanLogical}
    val e = Tables.embeddings(s, dir)
    val hPath = artifactDir("anni", dir, "embeddings")
    cached(hPath) {
      AnnIndex.build(e, "vec_id", "embedding", hPath,
        AnnParams(m = 16, efConstruction = 128, ef = 64,
          metric = "inner", numPartitions = 4))
    }
    val iPath = artifactDir("ivfi", dir, "embeddings")
    cached(iPath) {
      IvfIndex.build(e, "vec_id", "embedding", iPath, nlists = 16, metric = "inner")
    }
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val exact = e
      .withColumn("d", -inner_product(col("embedding"), lit(q)))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    def recallOf(ids: Set[Long]): Double =
      ids.intersect(exact).size.toDouble / exact.size
    val hnswOk = recallOf(AnnIndex.search(s, hPath, q, 10).map(_._1).toSet) >= 0.8
    // MIPS needs more probes than l2 at equal recall: high-inner-product
    // vectors are magnitude-driven and spread across l2-kmeans lists
    // (nprobe 8/16 measures 0.7 recall here, 12/16 measures 0.9)
    val ivfOk = recallOf(IvfIndex.search(s, iPath, q, 10, nprobe = 12)
      .select("id").collect().map(_.getLong(0)).toSet) >= 0.8
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(hPath, "vec_id", "embedding", "inner", ef = 64))
    val plannerOk = try {
      val knn = e.select(col("vec_id"), col("embedding"))
        .orderBy(-inner_product(col("embedding"), lit(q))).limit(10)
      val usedIndex = knn.queryExecution.optimizedPlan.collect {
        case a: AnnScanLogical => a
      }.nonEmpty
      usedIndex && recallOf(knn.select("vec_id").collect().map(_.getLong(0)).toSet) >= 0.8
    } finally AnnCatalog.unregister(s, tablePath)
    if (hnswOk && ivfOk && plannerOk) Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  /** In-graph scalar quantization gate (`quant_bits` analog,
    * lantern_hnsw/src/hnsw/options.c:137-158): the SAME data indexed
    * with i8 element storage must (a) reach recall@10 ≥ 0.8 searching
    * on quantized distances alone, (b) reach ≥ 0.9 with the exact
    * float re-rank, and (c) produce shard files under half the f32
    * artifact's bytes (raw vector payload shrinks 4×; neighbor lists
    * and gzip dilute the file-level ratio). */
  private def i8AnnRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val f32Path = artifactDir("ann", dir, "embeddings")
    cached(f32Path) {
      AnnIndex.build(e, "vec_id", "embedding", f32Path,
        AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))
    }
    val i8Path = artifactDir("anni8", dir, "embeddings")
    cached(i8Path) {
      AnnIndex.build(e, "vec_id", "embedding", i8Path,
        AnnParams(m = 16, efConstruction = 128, ef = 64,
          numPartitions = 4, quant = "i8"))
    }
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val exact = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    def recallOf(ids: Set[Long]): Double =
      ids.intersect(exact).size.toDouble / exact.size
    val plain = recallOf(AnnIndex.search(s, i8Path, q, 10).map(_._1).toSet)
    val reranked = recallOf(
      AnnIndex.searchRerank(e, "vec_id", "embedding", i8Path, q, 10).map(_._1).toSet)
    val sizeOk =
      AnnIndex.graphBytes(s, i8Path) * 2 <= AnnIndex.graphBytes(s, f32Path)
    if (plain >= 0.8 && reranked >= 0.9 && sizeOk) Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("knn_ann_recall", Some("SELECT 1 AS ok"), annRecall),
    QueryDef("streaming_ann_insert", Some("SELECT 1 AS ok"), streamingAnnInsert),
    QueryDef("knn_ann_filtered", Some("SELECT 1 AS ok"), annFiltered),
    QueryDef("knn_ann_filtered_planner", Some("SELECT 1 AS ok"), annFilteredPlanner),
    QueryDef("knn_ivf_filtered_planner", Some("SELECT 1 AS ok"), ivfFilteredPlanner),
    QueryDef("knn_ivfpq_filtered_planner", Some("SELECT 1 AS ok"), ivfpqFilteredPlanner),
    QueryDef("knn_join_ann", Some("SELECT 1 AS ok"), knnJoinAnn),
    QueryDef("knn_join_planner", Some("SELECT 1 AS ok"), knnJoinPlanner),
    QueryDef("knn_join_ivf_planner", Some("SELECT 1 AS ok"), knnJoinIvfPlanner),
    QueryDef("knn_join_ivfpq_planner", Some("SELECT 1 AS ok"), knnJoinIvfPqPlanner),
    QueryDef("knn_join_pq_planner", Some("SELECT 1 AS ok"), knnJoinPqPlanner),
    QueryDef("knn_join_hamming_planner", Some("SELECT 1 AS ok"),
      knnJoinHammingPlanner),
    QueryDef("autotune_pick", Some("SELECT 1 AS ok"), autotunePick),
    QueryDef("catalog_persist", Some("SELECT 1 AS ok"), catalogPersist),
    QueryDef("knn_ann_i8", Some("SELECT 1 AS ok"), i8AnnRecall),
    QueryDef("knn_ann_planner", Some("SELECT 1 AS ok"), annPlanner),
    QueryDef("ivf_recall_gate", Some("SELECT 1 AS ok"), ivfRecall),
    QueryDef("ivfpq_recall_gate", Some("SELECT 1 AS ok"), ivfPqRecall),
    QueryDef("knn_hamming_ann", Some("SELECT 1 AS ok"), hammingAnnRecall),
    QueryDef("knn_inner_ann", Some("SELECT 1 AS ok"), innerAnnRecall),
  )
}
