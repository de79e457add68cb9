package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.VectorSearch
import graft.pq.ProductQuantizer

/** IVF (inverted-file) ANN index — the brief's "IVF variant as the
  * scale path" for similarity search, expressed with Spark's own
  * storage primitives: coarse k-means centroids assign every vector to
  * a list, the table is written `partitionBy(list_id)`, and a search
  * probes only the `nprobe` nearest lists — the `list_id IN (...)`
  * filter is a PARTITION filter, so Catalyst prunes unprobed lists at
  * planning time and the scan reads nprobe/nlists of the data.
  *
  * Complements HNSW: no graph build cost, index = plain Parquet
  * (any engine can read it), updates = append rows to their list
  * partition; recall is tuned by nprobe instead of ef. Metrics: l2sq
  * natively; cos via unit-normalization at build and search
  * (l2sq on unit vectors orders identically to cosine distance).
  */
object IvfIndex {

  private val CentroidsDir = "centroids"
  private val DataDir = "data"

  def build(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nlists: Int = 64,
      metric: String = "l2sq",
      sampleLimit: Int = 100000,
      seed: Long = 42L): Unit = {
    require(metric == "l2sq" || metric == "cos" || metric == "inner",
      s"graft: IVF supports l2sq|cos|inner, got '$metric'")
    val spark = df.sparkSession
    val base = new Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(base)) fs.delete(base, true)

    val data0 = df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
    val data = if (metric == "cos") data0.withColumn("vec", normalized(col("vec")))
      else data0

    val sample = graft.util.Sampling
      .hashSample(data.select("vec"), sampleLimit, col("vec"))
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "graft: empty sample for IVF coarse centroids")
    val centroids = ProductQuantizer.kmeansLocalPublic(
      sample, nlists, maxIter = 20, tol = 0.1, seed = seed)

    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq, metric) }.toSeq
      .toDF("list_id", "centroid", "metric")
      .coalesce(1)
      .write.parquet(s"$path/$CentroidsDir")

    // centroid-argmin as a codegen'd expression (centroid matrix rides
    // as a reference object) — no per-row UDF ser/de in the build scan
    data.withColumn("list_id",
        org.apache.spark.sql.graftshim.GraftSqlShim.column(
          graft.functions.NearestCentroid(
            org.apache.spark.sql.graftshim.GraftSqlShim.expression(col("vec")),
            centroids)))
      .write.partitionBy("list_id").parquet(s"$path/$DataDir")
  }

  private[graft] def nearestList(v: Array[Float], cs: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var j = 0
      val cc = cs(c)
      while (j < v.length) { val x = v(j) - cc(j); d += x * x; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def normalized(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.GraftSqlShim.column(
      graft.functions.UnitNormalize(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(c)))

  // fingerprint-cached: centroids sit on the serving path of every
  // query, and a per-search parquet read is a Spark job each time
  private def loadCentroids(spark: SparkSession, path: String)
      : (Array[Array[Float]], String) =
    graft.util.ArtifactCache.cached(spark, s"$path/$CentroidsDir") {
      val rows = spark.read.parquet(s"$path/$CentroidsDir")
        .orderBy("list_id").collect()
      (rows.map(_.getSeq[Float](1).toArray), rows.head.getString(2))
    }

  /** The metric the index was built under (persisted with the
    * centroids) — serving layers must not route a foreign-metric
    * query through it. */
  def metricOf(spark: SparkSession, path: String): String =
    loadCentroids(spark, path)._2

  /** Artifact sniff for serving layers that route by layout: an IVF
    * artifact is centroids + list-partitioned data WITHOUT a codebook
    * (the codebook dir is what distinguishes [[IvfPqIndex]]). */
  def isIvf(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(s"$path/$CentroidsDir")) &&
      fs.exists(new Path(s"$path/$DataDir")) &&
      !fs.exists(new Path(s"$path/codebook"))
  }

  /** `aminsert` analog: assign the new rows to the PERSISTED coarse
    * centroids — the list geometry is the codec, fixed at build time
    * (re-clustering would re-key the corpus) — and append them into
    * their list partitions as new parquet files. Search sees them on
    * its next read; the list assignment is bit-identical to a build
    * with the same centroids, so a streamed index answers exactly like
    * a batch-appended one. */
  def append(df: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val spark = df.sparkSession
    val (centroids, metric) = loadCentroids(spark, path)
    val data0 = df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
    val data = if (metric == "cos") data0.withColumn("vec", normalized(col("vec")))
      else data0
    data.withColumn("list_id",
        org.apache.spark.sql.graftshim.GraftSqlShim.column(
          graft.functions.NearestCentroid(
            org.apache.spark.sql.graftshim.GraftSqlShim.expression(col("vec")),
            centroids)))
      .write.mode("append").partitionBy("list_id").parquet(s"$path/$DataDir")
  }

  /** Leaf parquet file count across the list partitions — the
    * append-accumulation measure serving layers compact on. */
  def fileCount(spark: SparkSession, path: String): Int =
    FlatArtifact.parquetFileCount(spark, s"$path/$DataDir")

  /** Compact the append-accumulated list files back to one file per
    * list and apply tombstones PHYSICALLY — same snapshot-preserving
    * tombstone protocol as [[BqIndex.consolidate]] (a concurrent
    * [[delete]] keeps masking; the data subdir swaps by rename). The
    * `repartition(list_id)` clusters each list into exactly one task,
    * so the rewrite emits one file per list — the bounded layout a
    * partition-pruned probe wants. */
  def consolidate(spark: SparkSession, path: String): Unit =
    FlatArtifact.consolidateSubdir(spark, path, DataDir, "ivf data",
      (live, compact) => live.repartition(col("list_id"))
        .write.partitionBy("list_id").mode("overwrite").parquet(compact))

  /** Tombstone ids (`ambulkdelete` analog, same semantics as the HNSW
    * index): rows stay in their list partitions, masked at search;
    * [[consolidate]] applies them physically. */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("id").write.mode("append").parquet(s"$path/tombstones")
  }

  private def tombstones(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new Path(path, "tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** The probed scan as a DataFrame (id, vec, list_id) plus the
    * (possibly normalized) query and the index metric — exposed so
    * tests can assert the PartitionFilters pruning in the plan. */
  def probedScan(
      spark: SparkSession, path: String, query: Array[Float], nprobe: Int)
      : (DataFrame, Array[Float], String) = {
    val (centroids, metric) = loadCentroids(spark, path)
    val q = Metric.normalizeIfCos(query, metric)
    // list assignment always uses l2 k-means (the faiss IVF-IP shape);
    // probe ORDER follows the metric: max-inner-product queries visit
    // the lists whose centroids score highest by dot product
    val probes = centroids.zipWithIndex
      .map { case (c, i) =>
        var d = 0.0; var j = 0
        if (metric == "inner") {
          while (j < q.length) { d -= q(j).toDouble * c(j); j += 1 }
        } else {
          while (j < q.length) { val x = q(j) - c(j); d += x * x; j += 1 }
        }
        (i, d)
      }
      .sortBy(_._2).take(math.max(nprobe, 1)).map(_._1)
    val base = spark.read.parquet(s"$path/$DataDir")
      .where(col("list_id").isin(probes.toIndexedSeq: _*))
    val scan = tombstones(spark, path) match {
      case Some(t) => base.join(broadcast(t), Seq("id"), "left_anti")
      case None => base
    }
    (scan, q, metric)
  }

  /** `validate_index` analog for the coarse-list artifact (the
    * reference validates every index kind it has —
    * lantern_hnsw/src/hnsw/validate_index.c:436-528): structural
    * checks — no null/duplicate ids, a recognized recorded metric —
    * plus the codec check that matters most for THIS layout: every
    * stored row must be FILED UNDER the list its persisted-centroid
    * assignment names (a mis-filed row is invisible to the pruned
    * probe — silent recall loss). With `source` supplied the check is
    * two-directional: every stored row re-derives from a source row
    * (stored vector equal to the source vector under the recorded
    * metric's normalization) AND every source row is stored (a missing
    * row is corruption the stored→expected direction alone cannot
    * see); tombstoned ids are excused from the missing-row direction
    * only after [[consolidate]] removed them physically. Throws
    * [[IllegalStateException]] naming the FIRST violation; returns the
    * stored row count. */
  def validateIndex(spark: SparkSession, path: String,
      source: Option[(DataFrame, String, String)] = None): Long = {
    // loadCentroids dereferences rows.head — an empty centroids table
    // must still surface as the validator's named violation
    val (centroids, metric) =
      try loadCentroids(spark, path)
      catch { case _: NoSuchElementException =>
        throw new IllegalStateException(
          s"graft: ivf index $path invalid — no centroids")
      }
    if (!Set("l2sq", "cos", "inner")(metric)) throw new IllegalStateException(
      s"graft: ivf index $path invalid — unrecognized metric '$metric'")
    val stored = spark.read.parquet(s"$path/$DataDir")
    val nullRow = stored.where(col("id").isNull || col("vec").isNull)
      .limit(1).collect()
    if (nullRow.nonEmpty) throw new IllegalStateException(
      s"graft: ivf index $path invalid — row with null id/vec")
    val dup = stored.groupBy("id").count().where(col("count") > 1)
      .limit(1).collect()
    if (dup.nonEmpty) throw new IllegalStateException(
      s"graft: ivf index $path invalid — duplicate id ${dup.head.getLong(0)}")
    // the assignment re-derivation runs as the same codegen'd
    // expression build/append used — bit-identical by construction, one
    // distributed pass, no per-row UDF
    val assigned = org.apache.spark.sql.graftshim.GraftSqlShim.column(
      graft.functions.NearestCentroid(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(col("vec")),
        centroids))
    val misfiled = stored.where(col("list_id") =!= assigned)
      .select(col("id"), col("list_id"), assigned.as("__exp"))
      .limit(1).collect()
    if (misfiled.nonEmpty) throw new IllegalStateException(
      s"graft: ivf index $path invalid — id ${misfiled.head.getLong(0)} " +
        s"filed under list ${misfiled.head.get(1)}, persisted-centroid " +
        s"assignment says ${misfiled.head.get(2)}")
    source.foreach { case (df, idCol, vecCol) =>
      val vecExpr =
        if (metric == "cos") normalized(col(vecCol)) else col(vecCol)
      val expected = df.select(col(idCol).cast(LongType).as("id"),
        vecExpr.as("__exp"))
      // orphan check runs on the SERVING set (stored minus pending
      // tombstones): a tombstoned row can never surface, so its source
      // row having been deleted table-first is a pending delete, not
      // corruption — the table-authoritative protocol must validate
      val orphan = FlatArtifact.minusTombstones(spark, path,
          stored.select("id"))
        .join(expected.select("id"), Seq("id"), "left_anti")
        .limit(1).collect()
      if (orphan.nonEmpty) throw new IllegalStateException(
        s"graft: ivf index $path invalid — id ${orphan.head.getLong(0)} " +
          "has no source row to re-derive from")
      val missing = FlatArtifact.minusTombstones(spark, path,
          expected.select("id")
            .join(stored.select("id"), Seq("id"), "left_anti"))
        .limit(1).collect()
      if (missing.nonEmpty) throw new IllegalStateException(
        s"graft: ivf index $path invalid — source id " +
          s"${missing.head.getLong(0)} is not stored (missing row)")
      val drift = stored.join(expected, Seq("id"))
        .where(!(col("vec") <=> col("__exp")))
        .select("id").limit(1).collect()
      if (drift.nonEmpty) throw new IllegalStateException(
        s"graft: ivf index $path invalid — id ${drift.head.getLong(0)}'s " +
          "stored vector does not re-derive from its source row")
    }
    stored.count()
  }

  /** Top-k over the probed lists: partition-pruned scan + exact
    * distance + TakeOrderedAndProject. Returns (id, dist); for the
    * `inner` metric `dist` is the negative inner product (max inner
    * product == min distance, same convention as the exact path).
    */
  def search(
      spark: SparkSession,
      path: String,
      query: Array[Float],
      k: Int,
      nprobe: Int = 8): DataFrame = {
    val (scan, q, metric) = probedScan(spark, path, query, nprobe)
    val distMetric = if (metric == "inner") "inner" else "l2sq"
    scan
      .withColumn("dist", VectorSearch.distance(distMetric, col("vec"), lit(q)))
      .orderBy(col("dist"), col("id"))
      .limit(k)
      .select("id", "dist")
  }

  /** Batch IVF search — the kNN-JOIN (LATERAL) scale path for the
    * coarse-list kind, mirroring [[AnnIndex.searchMany]]'s contract and
    * output shape (query_id, neighbor_id, dist, rank ≤ k): every query
    * resolves its `nprobe` nearest lists on the driver (centroids are
    * already driver-resident), the probed queries broadcast-join the
    * ONE partition-pruned scan of the union of probed lists, and a
    * per-query window rank keeps k. Index-side I/O is bounded by the
    * union of probed lists — independent of the query count.
    */
  def searchMany(
      spark: SparkSession,
      path: String,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      nprobe: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val (centroids, metric) = loadCentroids(spark, path)
    val np = math.min(math.max(nprobe, 1), centroids.length)
    val qn = queries.map { case (qid, q0) =>
      (qid, Metric.normalizeIfCos(q0, metric))
    }
    // per-query probe lists, same metric-aware ordering as probedScan
    val pairs = qn.flatMap { case (qid, q) =>
      centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        if (metric == "inner") {
          while (j < q.length) { d -= q(j).toDouble * c(j); j += 1 }
        } else {
          while (j < q.length) { val x = q(j) - c(j); d += x * x; j += 1 }
        }
        (i, d)
      }.sortBy(_._2).take(np).map { case (l, _) => (qid, l) }
    }
    val allLists = pairs.map(_._2).distinct
    // (query_id, list_id) pairs and ONE vector row per query — joining
    // the pair table alone on list_id keeps the broadcast and the
    // scan-side join width at one vector copy per query, not nprobe
    val pairDf = pairs.toDF("query_id", "list_id")
    val qVecDf = qn.map { case (qid, q) => (qid, q.toSeq) }
      .toDF("query_id", "__q")
    val base = spark.read.parquet(s"$path/$DataDir")
      .where(col("list_id").isin(allLists: _*))
    val scan = tombstones(spark, path) match {
      case Some(t) => base.join(broadcast(t), Seq("id"), "left_anti")
      case None => base
    }
    val distMetric = if (metric == "inner") "inner" else "l2sq"
    val local = scan.join(broadcast(pairDf), Seq("list_id"))
      .join(broadcast(qVecDf), Seq("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        VectorSearch.distance(distMetric, col("vec"), col("__q")).as("dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    local.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** `WHERE pred ORDER BY dist LIMIT k` through the IVF index — the
    * post-filter scan analog for coarse-list indexes, mirroring
    * [[AnnIndex.searchFiltered]]'s contract: adaptive widening (probe
    * count AND candidate pool doubled per round), survivors re-ranked
    * by the EXACT metric over the TABLE's true vector column (so the
    * index's normalized/approximate storage never alters result
    * semantics), ties (dist, id). Unlike HNSW, `nprobe = nlists` with
    * an under-filled candidate pool PROVES full enumeration of live
    * rows, so this path can return a complete short result without the
    * exact-scan fallback; the fallback still guards round exhaustion.
    */
  def searchFiltered(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      query: Array[Float],
      k: Int,
      pred: org.apache.spark.sql.Column,
      nprobeOverride: Int = 0,
      maxRounds: Int = 3): Array[(Long, Double)] = {
    val spark = df.sparkSession
    val (centroids, metric) = loadCentroids(spark, path)
    val nlists = centroids.length
    val filtered = df.where(pred)
    val distC = VectorSearch.distance(metric, col(vecCol), lit(query))
    var nprobe = math.min(math.max(
      if (nprobeOverride > 0) nprobeOverride else 8, 1), nlists)
    var candK = math.max(2 * k, 16)
    var round = 0
    while (round < maxRounds) {
      val cands = search(spark, path, query, candK, nprobe)
        .select(col("id").as("__cand_id"))
      val candIds = cands.collect().map(_.getLong(0))
      val candDf = {
        import spark.implicits._
        candIds.toSeq.toDF("__cand_id")
      }
      val surv = filtered
        .join(broadcast(candDf), col(idCol) === col("__cand_id"))
        .select(col(idCol).cast(LongType), distC.as("__d"))
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy(x => (x._2, x._1))
      if (surv.length >= k) return surv.take(k)
      if (nprobe >= nlists && candIds.length < candK) return surv
      nprobe = math.min(nprobe * 2, nlists)
      candK = candK * 4
      round += 1
    }
    // fallback over the table MINUS tombstones — the adaptive path
    // masks deletes in-index; without the anti-join a deleted row
    // would resurrect exactly when the predicate starves
    val live = tombstones(spark, path) match {
      case Some(t) => filtered.join(
        t.select(col("id").as("__tomb_id")),
        col(idCol) === col("__tomb_id"), "left_anti")
      case None => filtered
    }
    live
      .select(col(idCol).cast(LongType).as("id"), distC.as("__d"))
      .orderBy(col("__d"), col("id"))
      .limit(k)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
  }
}
