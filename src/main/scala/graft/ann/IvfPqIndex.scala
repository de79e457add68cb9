package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.pq.{PqCodebook, ProductQuantizer}

/** IVF-PQ — coarse inverted lists with PQ-compressed RESIDUALS, the
  * canonical billion-scale ANN serving layout (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011; the faiss
  * `IVFPQ` index). Combines the repo's two scale primitives:
  *
  *  - [[IvfIndex]]'s layout: coarse k-means lists stored as Parquet
  *    `partitionBy(list_id)`, so probing `nprobe` lists is a PARTITION
  *    filter Catalyst prunes at planning time;
  *  - [[PqCodebook]]'s asymmetric distance: rows store `subvectors`
  *    one-byte codes instead of `4·dim` float bytes (×32 compression
  *    at dim=64/m=8), scanned against a per-list lookup table.
  *
  * Quantizing the residual `v − centroid(list)` instead of `v` is what
  * makes the combination work: residuals concentrate near the origin,
  * so the same 256 clusters per subvector spend their resolution on
  * the part of the vector the coarse step did NOT explain —
  * `‖q−v‖² = ‖(q−c) − (v−c)‖²`, so the list-relative LUT estimates
  * the TRUE distance. Search re-ranks the LUT top-`max(ef,4k)` against
  * the caller's float source (broadcast join-back of candidate ids —
  * the index itself never stores floats; at 100 TB the floats live in
  * the source table, the index is the compact artifact).
  *
  * Metrics: l2sq natively; cos via unit-normalization at build and
  * query (identical ordering on unit vectors, same as [[IvfIndex]]).
  */
object IvfPqIndex {

  private val CentroidsDir = "centroids"
  private val CodebookDir = "codebook"
  private val DataDir = "data"

  def build(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nlists: Int = 64,
      subvectors: Int = 8,
      clusters: Int = 256,
      metric: String = "l2sq",
      sampleLimit: Int = 100000,
      seed: Long = 42L): Unit = {
    require(metric == "l2sq" || metric == "cos",
      s"graft: IVF-PQ supports l2sq|cos, got '$metric'")
    val spark = df.sparkSession
    val base = new Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(base)) fs.delete(base, true)

    val data0 = df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
    val data = if (metric == "cos") data0.withColumn("vec", unitNorm(col("vec")))
      else data0

    // one bounded sample feeds BOTH trainings (coarse lists, then the
    // residual codebook) — corpus passes stay at two total (this
    // sample + the final encode)
    val sample = graft.util.Sampling
      .hashSample(data.select("vec"), sampleLimit, col("vec"))
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "graft: empty sample for IVF-PQ training")
    val dim = sample.head.length
    require(dim % subvectors == 0,
      s"graft: dim $dim not divisible by subvectors $subvectors")
    val centroids = ProductQuantizer.kmeansLocalPublic(
      sample, nlists, maxIter = 20, tol = 0.1, seed = seed)

    // per-subvector Lloyd's over the sample RESIDUALS (same fit shape
    // as ProductQuantizer.trainCodebook, which SURVEY pins to the
    // reference CLI: tol=0.1, max 20 iters, seeded)
    val residuals = sample.map { v =>
      val c = centroids(IvfIndex.nearestList(v, centroids))
      val r = new Array[Float](dim)
      var j = 0
      while (j < dim) { r(j) = v(j) - c(j); j += 1 }
      r
    }
    val subDim = dim / subvectors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fits = (0 until subvectors).map { s =>
      Future {
        val pts = residuals.map(v =>
          java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
        ProductQuantizer.kmeansLocalPublic(
          pts, clusters, maxIter = 20, tol = 0.1, seed = seed + 1 + s)
      }
    }
    val cb = PqCodebook(dim,
      Await.result(Future.sequence(fits), Duration.Inf).toArray)

    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq, metric) }.toSeq
      .toDF("list_id", "centroid", "metric")
      .coalesce(1)
      .write.parquet(s"$path/$CentroidsDir")
    cb.toDf(spark).coalesce(1).write.parquet(s"$path/$CodebookDir")

    // final encode pass: assign list, quantize the residual. One UDF
    // carrying two small broadcast-size arrays — build/append only,
    // the search scan never touches floats.
    encoded(data, centroids, cb)
      .write.partitionBy("list_id").parquet(s"$path/$DataDir")
  }

  /** (id, codes, list_id) for `data(id, vec)` under fixed coarse
    * centroids + codebook — the shared encode of [[build]]'s final
    * pass and [[append]] (fixed codec ⇒ identical encoding either
    * way). */
  private def encoded(
      data: DataFrame,
      centroids: Array[Array[Float]],
      cb: PqCodebook): DataFrame = {
    val spark = data.sparkSession
    val bcCents = spark.sparkContext.broadcast(centroids)
    val bcCb = spark.sparkContext.broadcast(cb)
    val encode = udf { v: Seq[Float] =>
      val vec = v.toArray
      val cents = bcCents.value
      val l = IvfIndex.nearestList(vec, cents)
      val c = cents(l)
      val r = new Array[Float](vec.length)
      var j = 0
      while (j < vec.length) { r(j) = vec(j) - c(j); j += 1 }
      (l, bcCb.value.quantize(r))
    }
    data
      .withColumn("__enc", encode(col("vec")))
      .select(col("id"), col("__enc._2").as("codes"), col("__enc._1").as("list_id"))
  }

  /** Artifact sniff for serving layers that route by layout: IVF-PQ is
    * the only artifact with centroids + codebook + list data. */
  def isIvfPq(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(s"$path/$CentroidsDir")) &&
      fs.exists(new Path(s"$path/$CodebookDir")) &&
      fs.exists(new Path(s"$path/$DataDir"))
  }

  /** `aminsert` analog: encode the new rows with the PERSISTED coarse
    * centroids AND residual codebook — both are the codec, fixed at
    * build time — and append into their list partitions. A streamed
    * index scores bit-identically to a batch-appended one (same
    * assignment, same codes, order-free LUT sums). */
  def append(df: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val spark = df.sparkSession
    val (centroids, metric) = loadCentroids(spark, path)
    val cb = loadCodebook(spark, path)
    val data0 = df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
    val data = if (metric == "cos") data0.withColumn("vec", unitNorm(col("vec")))
      else data0
    encoded(data, centroids, cb)
      .write.mode("append").partitionBy("list_id").parquet(s"$path/$DataDir")
  }

  /** Leaf parquet file count across the list partitions. */
  def fileCount(spark: SparkSession, path: String): Int =
    FlatArtifact.parquetFileCount(spark, s"$path/$DataDir")

  /** Compact to one file per list + physical tombstone apply — same
    * snapshot-preserving protocol and layout contract as
    * [[IvfIndex.consolidate]]. */
  def consolidate(spark: SparkSession, path: String): Unit =
    FlatArtifact.consolidateSubdir(spark, path, DataDir, "ivfpq data",
      (live, compact) => live.repartition(col("list_id"))
        .write.partitionBy("list_id").mode("overwrite").parquet(compact))

  private def unitNorm(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftshim.GraftSqlShim.column(
      graft.functions.UnitNormalize(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(c)))

  // fingerprint-cached like IvfIndex's — a per-search parquet read of
  // a few-KB table is a Spark job on every query's critical path
  private def loadCentroids(spark: SparkSession, path: String)
      : (Array[Array[Float]], String) =
    graft.util.ArtifactCache.cached(spark, s"$path/$CentroidsDir") {
      val rows = spark.read.parquet(s"$path/$CentroidsDir")
        .orderBy("list_id").collect()
      (rows.map(_.getSeq[Float](1).toArray), rows.head.getString(2))
    }

  /** The metric the index was built under (persisted with the
    * centroids). */
  def metricOf(spark: SparkSession, path: String): String =
    loadCentroids(spark, path)._2

  private def loadCodebook(spark: SparkSession, path: String): PqCodebook =
    graft.util.ArtifactCache.cached(spark, s"$path/$CodebookDir") {
      val df = spark.read.parquet(s"$path/$CodebookDir")
      // dim = subvectors × subDim, both recoverable from the stored rows
      val r = df.select(countDistinct(col("subvector_id")).cast("int"),
        max(size(col("centroid")))).head()
      PqCodebook.fromDf(df, r.getInt(0) * r.getInt(1))
    }

  /** `validate_index` analog for the coarse-list + residual-code
    * artifact (reference validate_index.c:436-528): structural checks
    * — no null/duplicate ids, a recognized metric, every stored code
    * row exactly `subvectors` wide with every code inside the codebook
    * range `[0, clusters)` (an out-of-range code would read garbage
    * LUT cells) — plus the full codec re-derivation when `source` is
    * supplied: every stored row's (list_id, codes) must equal the
    * shared [[encoded]] pass over its source vector (fixed codec ⇒
    * bit-identical), every stored id must have a source row, and every
    * source row must be stored (tombstoned ids excused). Throws
    * [[IllegalStateException]] naming the FIRST violation; returns the
    * stored row count. */
  def validateIndex(spark: SparkSession, path: String,
      source: Option[(DataFrame, String, String)] = None): Long = {
    val (centroids, metric) =
      try loadCentroids(spark, path)
      catch { case _: NoSuchElementException =>
        throw new IllegalStateException(
          s"graft: ivfpq index $path invalid — no centroids")
      }
    if (!Set("l2sq", "cos")(metric)) throw new IllegalStateException(
      s"graft: ivfpq index $path invalid — unrecognized metric '$metric'")
    val cb = loadCodebook(spark, path)
    val stored = spark.read.parquet(s"$path/$DataDir")
    val nullRow = stored.where(col("id").isNull || col("codes").isNull)
      .limit(1).collect()
    if (nullRow.nonEmpty) throw new IllegalStateException(
      s"graft: ivfpq index $path invalid — row with null id/codes")
    val badShape = stored.where(size(col("codes")) =!= cb.subvectors ||
        exists(col("codes"), c => c < 0 || c >= cb.clusters))
      .select("id").limit(1).collect()
    if (badShape.nonEmpty) throw new IllegalStateException(
      s"graft: ivfpq index $path invalid — id ${badShape.head.getLong(0)} " +
        s"has codes outside ${cb.subvectors} subvectors × " +
        s"[0, ${cb.clusters}) codebook range")
    // structural list range: a row filed under a list no probe can
    // name is invisible to every partition-pruned scan (unlike ivf,
    // the codes carry no vector to re-derive the assignment from
    // without `source`, so the range check is the structural floor)
    val badList = stored.where(col("list_id") < 0 ||
        col("list_id") >= centroids.length)
      .select(col("id"), col("list_id")).limit(1).collect()
    if (badList.nonEmpty) throw new IllegalStateException(
      s"graft: ivfpq index $path invalid — id ${badList.head.getLong(0)} " +
        s"filed under list ${badList.head.get(1)} outside " +
        s"[0, ${centroids.length})")
    val dup = stored.groupBy("id").count().where(col("count") > 1)
      .limit(1).collect()
    if (dup.nonEmpty) throw new IllegalStateException(
      s"graft: ivfpq index $path invalid — duplicate id ${dup.head.getLong(0)}")
    source.foreach { case (df, idCol, vecCol) =>
      val data0 = df.select(col(idCol).cast(LongType).as("id"),
        col(vecCol).as("vec"))
      val data = if (metric == "cos") data0.withColumn("vec", unitNorm(col("vec")))
        else data0
      val expected = encoded(data, centroids, cb)
        .select(col("id"), col("codes").as("__codes"),
          col("list_id").as("__list"))
      // serving-set orphan check (tombstoned rows excused — a pending
      // table-first delete is not corruption; see IvfIndex)
      val orphan = FlatArtifact.minusTombstones(spark, path,
          stored.select("id"))
        .join(expected.select("id"), Seq("id"), "left_anti")
        .limit(1).collect()
      if (orphan.nonEmpty) throw new IllegalStateException(
        s"graft: ivfpq index $path invalid — id ${orphan.head.getLong(0)} " +
          "has no source row to re-derive from")
      val missing = FlatArtifact.minusTombstones(spark, path,
          expected.select("id")
            .join(stored.select("id"), Seq("id"), "left_anti"))
        .limit(1).collect()
      if (missing.nonEmpty) throw new IllegalStateException(
        s"graft: ivfpq index $path invalid — source id " +
          s"${missing.head.getLong(0)} is not stored (missing row)")
      val drift = stored.join(expected, Seq("id"))
        .where(!(col("codes") <=> col("__codes")) ||
          col("list_id") =!= col("__list"))
        .select("id").limit(1).collect()
      if (drift.nonEmpty) throw new IllegalStateException(
        s"graft: ivfpq index $path invalid — id ${drift.head.getLong(0)}'s " +
          "(list_id, codes) do not re-derive from the persisted codec")
    }
    stored.count()
  }

  /** Tombstones, same semantics as [[IvfIndex.delete]]. */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("id").write.mode("append").parquet(s"$path/tombstones")
  }

  private def tombstones(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new Path(path, "tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** ADC top-k: probe the `nprobe` nearest lists (partition-pruned
    * scan over CODES only), score each row against its list's
    * residual LUT, then — when `rerank` supplies the float source —
    * exact-re-rank the LUT top-`max(ef, 4k)` via broadcast join-back.
    * Returns (id, dist): exact metric distance with rerank, LUT
    * estimate without.
    */
  /** Probed, tombstone-masked, LUT-scored scan shared by [[search]] and
    * [[candidateRows]]: `(rows(id, codes, list_id, lut_dist), centroids,
    * codebook, normalized query)`. */
  private def scoredScan(
      spark: SparkSession,
      path: String,
      query: Array[Float],
      nprobe: Int): (DataFrame, Array[Array[Float]], PqCodebook, Array[Float], String) = {
    val (centroids, metric) = loadCentroids(spark, path)
    val cb = loadCodebook(spark, path)
    val q = Metric.normalizeIfCos(query, metric)
    val probes = centroids.zipWithIndex
      .map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < q.length) { val x = q(j) - c(j); d += x * x; j += 1 }
        (i, d)
      }
      .sortBy(_._2).take(math.max(nprobe, 1)).map(_._1)
    // per-probed-list LUT on the query residual: nprobe × m × clusters
    // doubles — rides the closure, small by construction
    val luts: Map[Int, Array[Array[Double]]] = probes.map { l =>
      val c = centroids(l)
      val r = new Array[Float](q.length)
      var j = 0
      while (j < q.length) { r(j) = q(j) - c(j); j += 1 }
      l -> cb.l2sqLut(r)
    }.toMap
    // ADC scoring as a codegen'd expression keyed by list_id — the
    // probed-list scan stays inside whole-stage codegen (a Scala UDF
    // here pays per-row ser/de exactly where cost grows with corpus)
    import org.apache.spark.sql.graftshim.GraftSqlShim
    val adcLuts = graft.functions.PqAdc.Keyed(
      luts.map { case (l, lut) => (l.toLong, lut) })
    def adc(codes: org.apache.spark.sql.Column,
        listId: org.apache.spark.sql.Column) =
      GraftSqlShim.column(graft.functions.PqAdcDistKeyed(
        GraftSqlShim.expression(codes), GraftSqlShim.expression(listId),
        adcLuts))
    val base = spark.read.parquet(s"$path/$DataDir")
      .where(col("list_id").isin(probes.toIndexedSeq: _*))
    val scan = tombstones(spark, path) match {
      case Some(t) => base.join(broadcast(t), Seq("id"), "left_anti")
      case None => base
    }
    (scan.withColumn("lut_dist", adc(col("codes"), col("list_id"))),
      centroids, cb, q, metric)
  }

  def search(
      spark: SparkSession,
      path: String,
      query: Array[Float],
      k: Int,
      nprobe: Int = 8,
      rerank: Option[(DataFrame, String, String)] = None,
      ef: Int = 64): DataFrame = {
    val (rows, _, _, q, metric) = scoredScan(spark, path, query, nprobe)
    val scored = rows.select(col("id"), col("lut_dist"))
    rerank match {
      case None =>
        scored.orderBy(col("lut_dist"), col("id")).limit(k)
          .select(col("id"), col("lut_dist").as("dist"))
      case Some((src, srcId, srcVec)) =>
        val nCand = math.max(ef, 4 * k)
        val cands = scored.orderBy(col("lut_dist"), col("id")).limit(nCand)
          .select(col("id"))
        val srcVecCol =
          if (metric == "cos") unitNorm(col(srcVec)) else col(srcVec)
        src.select(col(srcId).cast(LongType).as("id"), srcVecCol.as("__v"))
          .join(broadcast(cands), Seq("id"))
          .select(col("id"),
            graft.functions.l2sq_dist(col("__v"), lit(q)).as("dist"))
          .orderBy(col("dist"), col("id"))
          .limit(k)
    }
  }

  /** Batch IVF-PQ search — the kNN-JOIN (LATERAL) path for the
    * compact-code kind, output-compatible with [[AnnIndex.searchMany]]
    * (query_id, neighbor_id, dist, rank ≤ k). One partition-pruned pass
    * over the union of every query's probed lists; each scan task
    * scores its rows against per-(query, list) residual LUTs built
    * lazily executor-side from the broadcast (queries, centroids,
    * codebook) — LUT state is (queries probing the task's lists) ×
    * m × clusters doubles, never shipped. With `rerank` (float source)
    * the per-query LUT top-`max(ef, 4k)` pool is re-ranked by the exact
    * metric over the TABLE's true vectors in one broadcast join-back,
    * same contract as [[search]]'s rerank arm.
    */
  def searchMany(
      spark: SparkSession,
      path: String,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      nprobe: Int = 8,
      ef: Int = 64,
      rerank: Option[(DataFrame, String, String)] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import spark.implicits._
    val (centroids, metric) = loadCentroids(spark, path)
    val cb = loadCodebook(spark, path)
    val np = math.min(math.max(nprobe, 1), centroids.length)
    val qn: Array[(Long, Array[Float])] = queries.iterator.map { case (qid, q0) =>
      (qid, Metric.normalizeIfCos(q0, metric))
    }.toArray
    // list → indexes into qn of the queries probing it (driver-side:
    // centroids are already resident, queries are budget-bounded)
    val byList: Map[Int, Array[Int]] = qn.zipWithIndex.flatMap { case ((_, q), qi) =>
      centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < q.length) { val x = q(j) - c(j); d += x * x; j += 1 }
        (i, d)
      }.sortBy(_._2).take(np).map { case (l, _) => (l, qi) }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val allLists = byList.keys.toSeq
    val base = spark.read.parquet(s"$path/$DataDir")
      .where(col("list_id").isin(allLists: _*))
    val scan = tombstones(spark, path) match {
      case Some(t) => base.join(broadcast(t), Seq("id"), "left_anti")
      case None => base
    }
    val bcQ = spark.sparkContext.broadcast(qn)
    val bcByList = spark.sparkContext.broadcast(byList)
    val bcCents = spark.sparkContext.broadcast(centroids)
    val bcCb = spark.sparkContext.broadcast(cb)
    val scored = scan.select(col("id"), col("codes"), col("list_id")).rdd
      .mapPartitions { it =>
        val qs = bcQ.value; val bl = bcByList.value
        val cents = bcCents.value; val book = bcCb.value
        val luts = scala.collection.mutable.HashMap
          .empty[(Int, Int), Array[Array[Double]]]
        it.flatMap { r =>
          val id = r.getLong(0)
          val codes = r.getSeq[Short](1)
          val list = r.getInt(2)
          bl.getOrElse(list, Array.empty[Int]).iterator.map { qi =>
            val lut = luts.getOrElseUpdate((qi, list), {
              val q = qs(qi)._2; val c = cents(list)
              val res = new Array[Float](q.length)
              var j = 0
              while (j < q.length) { res(j) = q(j) - c(j); j += 1 }
              book.l2sqLut(res)
            })
            var s = 0; var d = 0.0
            while (s < codes.length) { d += lut(s)(codes(s).toInt); s += 1 }
            Row(qs(qi)._1, id, d)
          }
        }
      }
    val local = spark.createDataFrame(scored, StructType(Seq(
      StructField("query_id", LongType),
      StructField("neighbor_id", LongType),
      StructField("dist", DoubleType))))
    rerank match {
      case None =>
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("dist"), col("neighbor_id"))
        local.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      case Some((src, srcId, srcVec)) =>
        AnnBatch.rerankPool(local, src, srcId, srcVec, qn.toSeq, k,
          pool = math.max(ef, 4 * k), unitNormSrc = metric == "cos")
    }
  }

  /** Planner hook (`AnnScanExec kind = "ivfpq"`): the LUT top-`max(ef,k)`
    * candidates, each emitted as its RECONSTRUCTED vector
    * `centroid(list) + dequantize(codes)` — the exact `Sort+Limit` the
    * rewrite rule leaves above then re-ranks against the IVF-PQ
    * approximation, mirroring the `"pq"` kind (and the reference's
    * in-graph asymmetric search). The planner always routes IVF-PQ
    * through the join-back form, so downstream consumers see the
    * table's true floats, never these approximations.
    */
  private[graft] def candidateRows(
      spark: SparkSession,
      path: String,
      query: Array[Float],
      k: Int,
      ef: Int,
      nprobe: Int): org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] = {
    val (rows, centroids, cb, _, _) = scoredScan(spark, path, query, nprobe)
    val bcCents = spark.sparkContext.broadcast(centroids)
    val bcCb = spark.sparkContext.broadcast(cb)
    val reconstruct = udf { (codes: Seq[Short], listId: Int) =>
      val c = bcCents.value(listId)
      val deq = bcCb.value.dequantize(codes.toArray)
      val v = new Array[Float](deq.length)
      var j = 0
      while (j < deq.length) { v(j) = c(j) + deq(j); j += 1 }
      v
    }
    rows
      .orderBy(col("lut_dist"), col("id"))
      .limit(math.max(ef, k))
      .select(col("id"), reconstruct(col("codes"), col("list_id")).as("vec"))
      .queryExecution.toRdd
  }
}
