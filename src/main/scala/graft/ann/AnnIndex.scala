package graft.ann

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._

/** Index build/search parameters. Defaults match the reference engine
  * (lantern_hnsw/src/hnsw/options.h:14-25: m=16, ef_construction=128,
  * ef=64; GUC init_k=10 options.h:44-45).
  */
case class AnnParams(
    m: Int = 16,
    efConstruction: Int = 128,
    ef: Int = 64,
    metric: String = "l2sq",
    numPartitions: Int = 0, // 0 = keep input partitioning
    seed: Long = 42L,
    // in-graph scalar storage (`quant_bits` reloption analog,
    // lantern_hnsw/src/hnsw/options.c:137-158, which accepts
    // {1,2,4,8,16,32} bits): f32 | f16 | i8 | b4 | b2 | b1 — the full
    // reference set (32/16/8/4/2/1). i8 and the packed kinds linearly
    // map [i8Lo, i8Hi] to 2^bits levels per element — intended for
    // (roughly) normalized embeddings; out-of-range values clamp.
    // Sub-byte kinds trade recall for 8–32× smaller artifacts; pair
    // them with `searchRerank` to recover exact-metric ranking.
    quant: String = "f32",
    i8Lo: Float = -1f,
    i8Hi: Float = 1f) {
  require(m >= 2 && m <= 128, s"graft: m=$m out of range [2,128]")
  require(efConstruction >= 1 && efConstruction <= 400,
    s"graft: ef_construction=$efConstruction out of range [1,400]")
  require(ef >= 1 && ef <= 400, s"graft: ef=$ef out of range [1,400]")
  Metric.id(metric) // validate eagerly
  Quant.id(quant)
  // mirror HnswGraph's constructor guard HERE so an invalid combination
  // fails before build() deletes a pre-existing artifact at the target
  // path (a late executor-side failure would leave a header-only
  // corrupt index behind)
  require(quant == "f32" || metric != "hamming",
    "graft: hamming shards store exact packed words — quant must be f32")
  // finite-only: a non-finite bound would serialize as invalid JSON in
  // the artifact header and silently read back as the defaults
  require(java.lang.Float.isFinite(i8Lo) && java.lang.Float.isFinite(i8Hi)
      && i8Hi > i8Lo,
    s"graft: invalid i8 range [$i8Lo, $i8Hi]")
}

/** Distributed ANN index over per-partition HNSW graph shards.
  *
  * The Spark-native replacement for the reference's index access method
  * (SURVEY.md §2.2, §3.2): `ambuild` = repartition + mapPartitions graph
  * build, each task streaming its shard to `<path>/graphs/part-*.hnsw`;
  * `amgettuple` = broadcast query → per-shard top-k → k·shards global
  * merge (tiny); `aminsert` = append-only delta shards; `ambulkdelete` =
  * tombstone file, labels masked at search (delete.c:15-73). The
  * external-index TCP protocol disappears — Spark *is* the external
  * indexer (SURVEY.md §2.7).
  *
  * Scale notes: build is shuffle-free beyond the one optional
  * repartition; a shard of ~1M × 128-dim floats is ~0.5 GB in memory —
  * size `numPartitions` so shards fit executors. Search cost is
  * O(shards · ef · log n) with NO table scan and no shuffle (the merge
  * input is k rows per shard).
  */
object AnnIndex {

  private val GraphDir = "graphs"
  private val TombDir = "tombstones"
  private val HeaderFile = "header.json"

  // ----------------------------------------------------------- header io

  case class Header(dim: Int, m: Int, efConstruction: Int, ef: Int,
      metric: String, idCol: String, vecCol: String, quant: String = "f32",
      i8Lo: Float = -1f, i8Hi: Float = 1f)

  private def writeHeader(fs: FileSystem, base: Path, h: Header): Unit = {
    val out = fs.create(new Path(base, HeaderFile), true)
    val json =
      s"""{"dim":${h.dim},"m":${h.m},"efConstruction":${h.efConstruction},
         |"ef":${h.ef},"metric":"${h.metric}","idCol":"${h.idCol}",
         |"vecCol":"${h.vecCol}","quant":"${h.quant}",
         |"i8Lo":${h.i8Lo},"i8Hi":${h.i8Hi}}""".stripMargin.replace("\n", "")
    out.write(json.getBytes("UTF-8"))
    out.close()
  }

  def readHeader(spark: SparkSession, path: String): Header = {
    val base = new Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(base, HeaderFile))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def num(k: String): Int =
      s""""$k":(\\d+)""".r.findFirstMatchIn(json).get.group(1).toInt
    def str(k: String): String =
      s""""$k":"([^"]*)"""".r.findFirstMatchIn(json).get.group(1)
    def strOpt(k: String, dflt: String): String =
      s""""$k":"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1)).getOrElse(dflt)
    def fnum(k: String, dflt: Float): Float =
      s""""$k":(-?[\\d.]+(?:[eE]-?\\d+)?)""".r.findFirstMatchIn(json)
        .map(_.group(1).toFloat).getOrElse(dflt)
    Header(num("dim"), num("m"), num("efConstruction"), num("ef"),
      str("metric"), str("idCol"), str("vecCol"), strOpt("quant", "f32"),
      fnum("i8Lo", -1f), fnum("i8Hi", 1f))
  }

  // -------------------------------------------------------------- build

  /** Build the index artifact. Infers dim from the first row (reference
    * build.c:242-292). Each task writes one shard file directly — no
    * driver round-trip, no shuffle of vectors beyond the repartition.
    */
  def build(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      params: AnnParams = AnnParams()): Header = {
    val spark = df.sparkSession
    val metricId = Metric.id(params.metric)
    // hamming indexes b1-packed bit vectors (array<int>, 32 bits per
    // element — ScalarQuantizer.quantizeB1); the graph stores them as
    // exact 16-bit word floats (Metric.b1ToWords). An array<float>
    // input under hamming is accepted as ALREADY word-packed (the
    // consolidate path round-trips through vectors()).
    val vecElem = df.schema(df.schema.fieldIndex(vecCol))
      .dataType.asInstanceOf[ArrayType].elementType
    val hammingFromB1 = metricId == Metric.Hamming && vecElem == IntegerType
    if (metricId == Metric.Hamming)
      require(vecElem == IntegerType || vecElem == FloatType,
        s"graft: hamming index expects array<int> (b1-packed) or " +
          s"array<float> (word-packed), got array<$vecElem>")
    def toWords(c: Column): Column =
      GraftSqlShim.column(graft.functions.B1ToWordsExpr(GraftSqlShim.expression(c)))
    val vecExpr = if (hammingFromB1) toWords(col(vecCol)) else col(vecCol)
    val data = df.select(col(idCol).cast(LongType), vecExpr.as(vecCol))
    val parted =
      if (params.numPartitions > 0) data.repartition(params.numPartitions, col(idCol))
      else data

    val rawDim = df.select(size(col(vecCol))).head().getInt(0)
    val dim = if (hammingFromB1) rawDim * 2 else rawDim

    val base = new Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(base)) fs.delete(base, true)
    fs.mkdirs(new Path(base, GraphDir))
    writeHeader(fs, base, Header(dim, params.m, params.efConstruction,
      params.ef, params.metric, idCol, vecCol, params.quant,
      params.i8Lo, params.i8Hi))

    writeShards(parted, path, dim, params, runId = "base")
    readHeader(spark, path)
  }

  /** Incremental insert (`aminsert` analog, insert.c:51-262): builds
    * delta shards from the new batch and appends them to the artifact.
    * Search covers base + delta shards transparently. Call
    * `consolidate` periodically to merge deltas (compaction job).
    */
  def append(df: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val spark = df.sparkSession
    val h = readHeader(spark, path)
    val params = AnnParams(h.m, h.efConstruction, h.ef, h.metric,
      quant = h.quant, i8Lo = h.i8Lo, i8Hi = h.i8Hi)
    val vecElem = df.schema(df.schema.fieldIndex(vecCol))
      .dataType.asInstanceOf[ArrayType].elementType
    val vecExpr =
      if (h.metric == "hamming" && vecElem == IntegerType)
        GraftSqlShim.column(graft.functions.B1ToWordsExpr(
          GraftSqlShim.expression(col(vecCol))))
      else col(vecCol)
    val data = df.select(col(idCol).cast(LongType), vecExpr.as(vecCol))
    writeShards(data, path, h.dim, params,
      runId = java.util.UUID.randomUUID().toString.take(8))
  }

  /** Rebuild all shards into one fresh artifact (compaction after many
    * appends/deletes — `consolidate_bm25_table` analog for the index).
    */
  def consolidate(spark: SparkSession, path: String, numPartitions: Int = 0): Unit = {
    val h = readHeader(spark, path)
    val live = vectors(spark, path)
    val tmp = path + ".consolidating"
    build(live, "id", "vec", tmp,
      AnnParams(h.m, h.efConstruction, h.ef, h.metric,
        numPartitions = numPartitions, quant = h.quant,
        i8Lo = h.i8Lo, i8Hi = h.i8Hi))
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.rename(new Path(tmp), new Path(path))
  }

  private def writeShards(
      data: DataFrame, path: String, dim: Int, params: AnnParams, runId: String): Unit = {
    val spark = data.sparkSession
    val sconf = GraftSqlShim.serializableConf(spark.sparkContext.hadoopConfiguration)
    val metricId = Metric.id(params.metric)
    val vecIdx = 1
    val counts = data.queryExecution.toRdd.mapPartitions { rows =>
      val pid = TaskContext.getPartitionId()
      val g = new HnswGraph(dim, params.m, params.efConstruction, metricId,
        seed = params.seed + pid,
        quant = Quant.id(params.quant), i8Lo = params.i8Lo, i8Hi = params.i8Hi)
      rows.foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(vecIdx)) {
          g.insert(r.getLong(0), r.getArray(vecIdx).toFloatArray())
        }
      }
      if (g.size == 0) Iterator.empty
      else {
        val file = new Path(new Path(path, GraphDir), f"part-$runId-$pid%05d.hnsw")
        val fs = file.getFileSystem(sconf.value)
        val out = new DataOutputStream(new BufferedOutputStream(fs.create(file, true), 1 << 20))
        try g.write(out) finally out.close()
        Iterator.single(g.size)
      }
    }.collect()
    require(counts.sum > 0, "graft: ANN build saw no rows")
  }

  // ------------------------------------------------------------- delete

  /** Tombstone labels (`ambulkdelete` analog): masked at search, graph
    * untouched (reference delete.c only invalidates labels).
    */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("id").write.mode("append").parquet(s"$path/$TombDir")
  }

  /** Executor-side deleted-label test. Small delete sets ship exactly;
    * past `ExactTombstoneLimit` the set becomes a DISTRIBUTED-built
    * bloom filter — fixed broadcast size at any delete count (billions
    * of tombstones would otherwise OOM the driver collect). Bloom false
    * positives (0.1%) can only mask LIVE candidates — a bounded recall
    * haircut, the usual ANN trade — never resurrect deleted rows. */
  private[ann] sealed trait TombstoneMask extends Serializable {
    def banned(id: Long): Boolean
  }
  private[ann] case object NoTombstones extends TombstoneMask {
    override def banned(id: Long): Boolean = false
  }
  private[ann] final case class ExactTombstones(ids: Set[Long]) extends TombstoneMask {
    override def banned(id: Long): Boolean = ids.contains(id)
  }
  private[ann] final case class BloomTombstones(
      bf: org.apache.spark.util.sketch.BloomFilter) extends TombstoneMask {
    override def banned(id: Long): Boolean = bf.mightContainLong(id)
  }
  private[ann] val ExactTombstoneLimit = 1000000L

  /** Number of graph shard files — search fans out one task per shard,
    * so callers use this to decide when appends warrant a
    * [[consolidate]] (compaction). */
  def shardCount(spark: SparkSession, path: String): Int =
    graphFiles(spark, path).size

  /** Total bytes of the graph shard files — artifact-size
    * introspection (the `quant_bits` 2–4× size lever is gated on
    * this). */
  def graphBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path, GraphDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".hnsw"))
      .map(_.getLen).sum
  }

  /** Raw tombstoned ids (column `id`) when any exist — the exact,
    * join-friendly form (no bloom false positives). */
  private[ann] def tombstonesDf(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new Path(path, TombDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Exact distance column for metrics whose table representation
    * matches the query layout — shared by [[searchRerank]] and
    * [[searchFiltered]] so their ranking can never drift apart.
    * Hamming is excluded: its tables hold b1-packed ints while search
    * queries are word-packed floats. */
  private def exactDistFn(metric: String, op: String): (Column, Column) => Column =
    metric match {
      case "l2sq" => graft.functions.l2sq_dist
      case "cos" => graft.functions.cos_dist
      case "inner" => (a, b) => -graft.functions.inner_product(a, b)
      case m => throw new IllegalArgumentException(
        s"graft: $op unsupported for metric '$m'")
    }

  private[graft] def tombstoneMask(spark: SparkSession, path: String): TombstoneMask =
    tombstonesDf(spark, path) match {
      case None => NoTombstones
      case Some(df) =>
        val n = df.count()
        if (n == 0) NoTombstones
        else if (n <= ExactTombstoneLimit)
          ExactTombstones(df.collect().map(_.getLong(0)).toSet)
        else BloomTombstones(df.stat.bloomFilter("id", n, 0.001))
    }

  // ------------------------------------------------------------- search

  private def graphFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path, GraphDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".hnsw"))
      .map(_.getPath.toString).sorted.toSeq
  }

  /** ANN top-k as a DataFrame (id, dist) nearest-first. One task per
    * shard; each task returns ≤k rows (global k per shard — the
    * safe-recall merge, SURVEY.md §7 known-hard #2), driver merges k·P.
    */
  def searchDf(
      spark: SparkSession,
      path: String,
      query: Array[Float],
      k: Int,
      efOverride: Int = 0): DataFrame = {
    val rows = search(spark, path, query, k, efOverride)
      .map { case (id, d) => Row(id, d) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(StructField("id", LongType), StructField("dist", DoubleType))))
  }

  /** `k = 0` falls back to the session's `spark.graft.ann.initK`
    * (the GUC `lantern_hnsw.init_k` — how many results a search
    * fetches when the caller doesn't say). */
  def search(
      spark: SparkSession,
      path: String,
      query: Array[Float],
      k: Int = 0,
      efOverride: Int = 0): Array[(Long, Double)] = {
    val kk = if (k > 0) k else graft.GraftConf.annInitK(spark)
    val h = readHeader(spark, path)
    val ef = math.max(if (efOverride > 0) efOverride else h.ef, kk)
    searchCore(spark, graphFiles(spark, path), tombstoneMask(spark, path),
      query, kk, ef)
  }

  /** The shard fan-out with the index-open work (file listing,
    * tombstone build) already done — lets repeated probes of one index
    * (searchFiltered's widening loop) pay that cost once. */
  private def searchCore(
      spark: SparkSession,
      files: Seq[String],
      banned: TombstoneMask,
      query: Array[Float],
      k: Int,
      ef: Int): Array[(Long, Double)] = {
    val sconf = GraftSqlShim.serializableConf(spark.sparkContext.hadoopConfiguration)
    val bannedB = spark.sparkContext.broadcast(banned)
    val qB = spark.sparkContext.broadcast(query)
    val kLocal = k
    spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { f =>
        val g = GraphCache.get(f, sconf.value)
        val b = bannedB.value
        g.search(qB.value, kLocal, ef, b.banned)
      }
      .collect()
      .sortBy(x => (x._2, x._1))
      .take(kLocal)
  }

  /** Filtered ANN search — `WHERE pred ORDER BY dist LIMIT k` through
    * the index. The reference satisfies this by streaming: the executor
    * keeps pulling tuples from the index scan and applies the WHERE
    * until the LIMIT fills (scan.c:332-333 post-filter + amgettuple's
    * resumable scan). Spark's planner rule instead refuses to fire
    * through a Filter (AnnScan.scala — a fixed candidate set can starve
    * the limit); THIS is the explicit operator for that shape:
    *
    *  1. over-fetch `max(ef, 2k)` candidates from the index;
    *  2. keep those passing `pred` — the tiny candidate set is
    *     broadcast-joined against the filtered table, so the predicate
    *     (and its pushdown) is evaluated by Spark, not re-implemented;
    *  3. too few survivors → widen 4× and rescan (the streaming
    *     analog); after `maxRounds` widenings fall back to EXACT
    *     filtered top-k (one TakeOrdered scan pass — the same fallback
    *     the planner rule uses, and the only correct answer when the
    *     predicate keeps < k rows).
    *
    * Selective predicates cost one index probe + candidate-sized joins;
    * hyper-selective ones degrade to the exact scan they require
    * anyway. `df` must hold the rows the index was built on.
    */
  def searchFiltered(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      query: Array[Float],
      k: Int,
      pred: Column,
      efOverride: Int = 0,
      maxRounds: Int = 3): Array[(Long, Double)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val h = readHeader(spark, path)
    // exact distance, resolved EAGERLY so an unsupported metric fails
    // before any index probe (hamming tables hold b1 packed ints while
    // the query here is word-packed — same restriction as searchRerank)
    val distFn = exactDistFn(h.metric, "searchFiltered")
    val filtered = df.where(pred)
    // index-open work (file listing, tombstone parquet read + driver
    // collect) paid ONCE, not per widening round + fallback
    val files = graphFiles(spark, path)
    val mask = tombstoneMask(spark, path)
    var width = math.max(math.max(if (efOverride > 0) efOverride else h.ef, 2 * k), 1)
    var round = 0
    while (round < maxRounds) {
      val cands = searchCore(spark, files, mask, query, width,
        math.max(math.max(efOverride, h.ef), width))
      // survivors ranked by the EXACT metric over the true vector
      // column (computed in the same candidate join), so both this
      // path and the fallback return identical distance semantics on
      // quantized (f16/i8) indexes — the searchRerank principle
      val candDf = cands.map(_._1).toSeq.toDF("__cand_id")
      val surv = filtered
        .join(org.apache.spark.sql.functions.broadcast(candDf),
          col(idCol) === $"__cand_id")
        .select($"__cand_id", distFn(col(vecCol), lit(query)).as("__d"))
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy(x => (x._2, x._1))
      if (surv.length >= k) return surv.take(k)
      // cands < width ⇒ the traversal has no more candidates to give —
      // but that does NOT prove full enumeration: HNSW neighbor pruning
      // can disconnect layer-0 components, leaving live rows the walk
      // never reaches. Further WIDENING is futile (same walk, same
      // reachable set), so stop the loop — but fall through to the
      // exact scan, which is the documented guarantee for starving
      // predicates and the only step that can see disconnected rows.
      if (cands.length < width) round = maxRounds
      else { width *= 4; round += 1 }
    }
    // exact fallback: distance over the filtered table MINUS
    // tombstones — search() masks deletes on the adaptive path, and a
    // fallback without the anti-join would resurrect deleted rows
    val live = tombstonesDf(spark, path) match {
      case Some(t) => filtered.join(
        t.select(col("id").as("__tomb_id")),
        col(idCol) === $"__tomb_id", "left_anti")
      case None => filtered
    }
    live
      .select(col(idCol).cast("long").as("__id"),
        distFn(col(vecCol), lit(query)).as("__d"))
      .orderBy($"__d", $"__id").limit(k)
      .as[(Long, Double)].collect()
  }

  /** Top-k with exact re-rank — the companion to quantized storage
    * (quant f16/i8): the quantized graph pre-selects `max(ef, 4k)`
    * candidates, then the true float column is fetched for just those
    * ids and ranked by the exact metric, so recall does not decay with
    * quantization error (same shape as PqAnnIndex.searchRerank). `df`
    * must hold the rows the index was built on.
    */
  def searchRerank(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      query: Array[Float],
      k: Int,
      efOverride: Int = 0): Array[(Long, Double)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val h = readHeader(spark, path)
    val ef = math.max(if (efOverride > 0) efOverride else h.ef, 4 * k)
    val cands = search(spark, path, query, ef, ef).map(_._1)
    val candDf = cands.toSeq.toDF("__cand_id")
    val distFn = exactDistFn(h.metric, "searchRerank")
    df.select(col(idCol).cast(LongType).as("__id"), col(vecCol).as("__v"))
      .join(broadcast(candDf), col("__id") === col("__cand_id"))
      .select(col("__id"), distFn(col("__v"), lit(query)).as("__d"))
      .as[(Long, Double)].collect()
      .sortBy(x => (x._2, x._1))
      .take(k)
  }

  /** Hamming top-k over a b1-packed query (array<int> layout, matching
    * `hamming_dist` and `ScalarQuantizer.quantizeB1`). Distances are
    * exact bit counts. */
  def searchHamming(
      spark: SparkSession,
      path: String,
      query: Array[Int],
      k: Int = 0,
      efOverride: Int = 0): Array[(Long, Double)] =
    search(spark, path, Metric.b1ToWords(query), k, efOverride)

  /** Batch ANN — the scale path for the k-NN JOIN (LATERAL pattern):
    * ALL query vectors broadcast once, ONE pass over the shards, each
    * task answering every query against its local graph, then a single
    * groupBy-rank merge of k·shards rows per query. Index-side I/O is
    * independent of the query count.
    */
  def searchMany(
      spark: SparkSession,
      path: String,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      efOverride: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = readHeader(spark, path)
    val ef = math.max(if (efOverride > 0) efOverride else h.ef, k)
    val files = graphFiles(spark, path)
    val banned = tombstoneMask(spark, path)
    val sconf = GraftSqlShim.serializableConf(spark.sparkContext.hadoopConfiguration)
    val bannedB = spark.sparkContext.broadcast(banned)
    val qB = spark.sparkContext.broadcast(queries.toArray)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { f =>
        val g = GraphCache.get(f, sconf.value)
        val b = bannedB.value
        qB.value.iterator.flatMap { case (qid, q) =>
          g.search(q, k, ef, b.banned).iterator
            .map { case (id, d) => Row(qid, id, d) }
        }
      }
    val local = spark.createDataFrame(rdd, StructType(Seq(
      StructField("query_id", LongType),
      StructField("neighbor_id", LongType),
      StructField("dist", DoubleType))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    local.withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("rank") <= k)
  }

  /** All live (id, vec) rows reconstructed from shards (minus tombstones). */
  def vectors(spark: SparkSession, path: String): DataFrame = {
    val h = readHeader(spark, path)
    val files = graphFiles(spark, path)
    val banned = tombstoneMask(spark, path)
    val sconf = GraftSqlShim.serializableConf(spark.sparkContext.hadoopConfiguration)
    val bannedB = spark.sparkContext.broadcast(banned)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { f =>
        val g = GraphCache.get(f, sconf.value)
        val b = bannedB.value
        (0 until g.size).iterator
          .filterNot(n => b.banned(g.ids(n)))
          .map(n => Row(g.ids(n), g.vector(n).toSeq))
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("id", LongType),
      StructField("vec", ArrayType(FloatType)))))
  }

  /** [[validate]] under the repo-wide validator convention the other
    * kinds follow (throws [[IllegalStateException]] naming the FIRST
    * violation; returns the live row count): the structural shard walk,
    * plus — with `source` — both-way id completeness against the
    * source table (tombstoned ids excused) and exact vector
    * re-derivation for EVERY storage kind: `f32` compares the source
    * floats directly, quantized storage (`f16|i8|b4|b2|b1`) compares
    * against the canonical snap round-trip
    * ([[graft.pq.ScalarQuantizer.snap]], the same code insert applies),
    * and hamming graphs repack the b1 source through the build's own
    * word codec. A drifted stored vector is a named violation under
    * any quant. */
  def validateIndex(spark: SparkSession, path: String,
      source: Option[(DataFrame, String, String)] = None): Long = {
    val issues = validate(spark, path).limit(1).collect()
    if (issues.nonEmpty) throw new IllegalStateException(
      s"graft: hnsw index $path invalid — shard " +
        s"${issues.head.getString(0)}: ${issues.head.getString(1)}")
    val live = vectors(spark, path)
    val h = readHeader(spark, path)
    source.foreach { case (df, idCol, vecCol) =>
      // re-derive the EXPECTED stored vector through the build's own
      // codec so the drift check compares like with like: hamming
      // graphs hold b1 ints repacked as word floats; quantized storage
      // holds the snap round-trip; f32 holds the source floats
      val srcElem = df.schema(df.schema.fieldIndex(vecCol))
        .dataType.asInstanceOf[ArrayType].elementType
      val expVec =
        if (h.metric == "hamming" && srcElem == IntegerType)
          GraftSqlShim.column(graft.functions.B1ToWordsExpr(
            GraftSqlShim.expression(col(vecCol))))
        else if (h.quant != "f32")
          GraftSqlShim.column(graft.functions.SnapQuantExpr(
            GraftSqlShim.expression(col(vecCol)), h.quant, h.i8Lo, h.i8Hi))
        else col(vecCol)
      val expected = df.select(col(idCol).cast(LongType).as("id"),
        expVec.as("__exp"))
      val orphan = live.select("id")
        .join(expected.select("id"), Seq("id"), "left_anti")
        .limit(1).collect()
      if (orphan.nonEmpty) throw new IllegalStateException(
        s"graft: hnsw index $path invalid — id ${orphan.head.getLong(0)} " +
          "has no source row to re-derive from")
      val missing = FlatArtifact.minusTombstones(spark, path,
          expected.select("id")
            .join(live.select("id"), Seq("id"), "left_anti"))
        .limit(1).collect()
      if (missing.nonEmpty) throw new IllegalStateException(
        s"graft: hnsw index $path invalid — source id " +
          s"${missing.head.getLong(0)} is not stored (missing row)")
      val drift = live.join(expected, Seq("id"))
        .where(!(col("vec") <=> col("__exp")))
        .select("id").limit(1).collect()
      if (drift.nonEmpty) throw new IllegalStateException(
        s"graft: hnsw index $path invalid — id " +
          s"${drift.head.getLong(0)}'s stored vector does not " +
          s"re-derive from its source row (quant=${h.quant})")
    }
    live.count()
  }

  /** `validate_index` analog: structural walk of every shard
    * (validate_index.c:436-528). Returns (shard, violation) rows;
    * empty = valid.
    */
  def validate(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = graphFiles(spark, path)
    val sconf = GraftSqlShim.serializableConf(spark.sparkContext.hadoopConfiguration)
    spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { f =>
        val g = GraphCache.get(f, sconf.value)
        g.validate().map(v => (f.split('/').last, v))
      }
      .toDF("shard", "violation")
  }
}

/** Per-executor shard cache — deserialize each graph file once per JVM,
  * not once per query (`ambeginscan`'s load-and-cache, scan.c:24-162).
  * Keyed by (path, length, mtime) so artifact rewrites invalidate.
  */
object GraphCache {
  // Bounded: an executor serving many indexes must not accumulate
  // graphs without limit. Accessed-ordered LinkedHashMap evicts the
  // least-recently-used shard beyond MaxEntries (each shard is the
  // dominant memory object — eviction == GC eligibility).
  private val MaxEntries = 64
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, HnswGraph](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, HnswGraph]): Boolean =
          size() > MaxEntries
      })

  // Per-key load locks: concurrent probes of one gate (the bounded
  // pool in RecallProtocol.probed issues up to 8 searches at once) must
  // share ONE deserialization of a missing shard, not race N duplicate
  // multi-MB loads. The lock map entry is dropped after the load; a
  // straggler still holding the old lock object just re-checks the
  // cache and hits.
  private val loadLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def get(file: String, conf: org.apache.hadoop.conf.Configuration): HnswGraph = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val key = s"$file#${st.getLen}#${st.getModificationTime}"
    var g = cache.get(key)
    if (g == null) {
      val lock = loadLocks.computeIfAbsent(key, _ => new Object)
      lock.synchronized {
        g = cache.get(key)
        if (g == null) {
          val in = new DataInputStream(
            new BufferedInputStream(fs.open(p), 1 << 20))
          try g = HnswGraph.read(in) finally in.close()
          cache.put(key, g)
        }
      }
      loadLocks.remove(key)
    }
    g
  }

  def clear(): Unit = cache.clear()
}
