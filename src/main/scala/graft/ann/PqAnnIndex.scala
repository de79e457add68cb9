package graft.ann

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.LongType

import graft.pq.PqCodebook

/** PQ-compressed ANN index (`pq=true` reloption): graph shards store
  * one byte per subvector instead of 4 bytes per dimension, and search
  * traverses with the asymmetric per-query LUT distance — the
  * reference's in-graph PQ (lantern_hnsw/src/hnsw/scan.c:75-88,
  * pqtable.c:194-333; build-side quantization build.c:498-501).
  *
  * Build inserts DEQUANTIZED vectors, so edges reflect the quantized
  * geometry exactly like the reference (whose graph holds codes and
  * measures through the codebook). The artifact is dim·4/subvectors
  * times smaller than the float index — at 100 TB that is the
  * difference between an index that fits executor memory and one that
  * doesn't. L2sq only (the reference gates its PQ tests on l2sq too).
  */
object PqAnnIndex {

  val Magic = 0x47505156 // "GPQV"
  private val GraphDir = "graphs"

  def build(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      cb: PqCodebook,
      params: AnnParams = AnnParams()): Unit = {
    // cos rides the l2sq machinery over UNIT-NORMALIZED vectors (the
    // standard cosine-as-l2sq reduction): the artifact stays a plain
    // l2sq PQ graph; callers searching a cos index normalize the query
    // (searchMany's metric param / the planner rule do this). Train
    // the codebook on the normalized column for best codes.
    require(params.metric == "l2sq" || params.metric == "cos",
      s"graft: PQ index supports l2sq|cos, got '${params.metric}'")
    require(cb.clusters <= 256, "graft: PQ codes must fit one byte")
    val spark = df.sparkSession
    val rawVec =
      if (params.metric == "cos")
        GraftSqlShim.column(graft.functions.UnitNormalize(
          GraftSqlShim.expression(col(vecCol))))
      else col(vecCol)
    val data = df.select(col(idCol).cast(LongType), rawVec.as(vecCol))
    val parted =
      if (params.numPartitions > 0) data.repartition(params.numPartitions, col(idCol))
      else data

    val base = new Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(base)) fs.delete(base, true)
    fs.mkdirs(new Path(base, GraphDir))
    // record the metric: a cos graph holds unit-normalized vectors —
    // an append that didn't normalize would silently mis-key new rows
    graft.util.MetaJson.write(spark, s"$path/meta.json",
      s"""{"metric":"${params.metric}"}""")
    writePqShards(parted, path, cb, params.m, params.efConstruction,
      params.seed, runId = "base")
  }

  /** The metric recorded at [[build]] time; pre-meta artifacts (older
    * builds) default to l2sq, the only metric they could carry. */
  def metricOf(spark: SparkSession, path: String): String =
    graft.util.MetaJson.read(spark, s"$path/meta.json") match {
      case Some(n) => graft.util.MetaJson.strField(n, "metric", path)
      case None => "l2sq"
    }

  /** Quantize + insert each partition's rows into a graph shard —
    * shared by [[build]] (runId = "base") and [[append]] (delta
    * shards). Every shard embeds the codebook, so shards from any
    * write generation stay mutually searchable. */
  private def writePqShards(
      data: DataFrame, path: String, cb: PqCodebook,
      m: Int, efc: Int, seed: Long, runId: String): Unit = {
    val spark = data.sparkSession
    val sconf = GraftSqlShim.serializableConf(spark.sparkContext.hadoopConfiguration)
    val cbB = spark.sparkContext.broadcast(cb)
    val counts = data.queryExecution.toRdd.mapPartitions { rows =>
      val pid = TaskContext.getPartitionId()
      val codebook = cbB.value
      val g = new HnswGraph(codebook.dim, m, efc, Metric.L2Sq, seed = seed + pid)
      val codes = scala.collection.mutable.ArrayBuffer[Array[Short]]()
      rows.foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(1)) {
          val v = r.getArray(1).toFloatArray()
          val c = codebook.quantize(v)
          codes += c
          g.insert(r.getLong(0), codebook.dequantize(c))
        }
      }
      if (g.size == 0) Iterator.empty
      else {
        val file = new Path(new Path(path, GraphDir), f"part-$runId-$pid%05d.pqhnsw")
        val out = new DataOutputStream(new BufferedOutputStream(
          file.getFileSystem(sconf.value).create(file, true), 1 << 20))
        try writeShard(out, g, codes.toArray, codebook) finally out.close()
        Iterator.single(g.size)
      }
    }.collect()
    require(counts.sum > 0, "graft: PQ ANN build saw no rows")
  }

  /** Artifact sniff for serving layers that route by layout: a pq
    * artifact is a graphs dir holding `.pqhnsw` shards. */
  def isPq(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path, GraphDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.endsWith(".pqhnsw"))
  }

  /** Graph shard count — the append-accumulation measure (search fans
    * out one task per shard). */
  def shardCount(spark: SparkSession, path: String): Int =
    listShards(spark, path).size

  /** `aminsert` analog: quantize the new rows with the PERSISTED
    * codebook — the codec is fixed at build time, and every existing
    * shard embeds it — and build DELTA graph shards for them. Search
    * covers base + delta shards transparently (per-shard k-merge). A
    * `cos` index is an l2sq graph over unit vectors; pass the metric
    * the index was built under so appends normalize identically. */
  def append(df: DataFrame, idCol: String, vecCol: String, path: String,
      metric: String = "l2sq", seed: Long = 42L): Unit = {
    require(metric == "l2sq" || metric == "cos",
      s"graft: PQ index supports l2sq|cos, got '$metric'")
    val spark = df.sparkSession
    val (cb, m, efc) = readCodec(spark, path)
    val rawVec =
      if (metric == "cos")
        GraftSqlShim.column(graft.functions.UnitNormalize(
          GraftSqlShim.expression(col(vecCol))))
      else col(vecCol)
    val data = df.select(col(idCol).cast(LongType), rawVec.as(vecCol))
    writePqShards(data, path, cb, m, efc, seed,
      runId = java.util.UUID.randomUUID().toString.take(8))
  }

  /** Codec + graph params, read from the first shard (shards are
    * self-contained; build writes one codebook into each). */
  private def readCodec(
      spark: SparkSession, path: String): (PqCodebook, Int, Int) = {
    val files = listShards(spark, path)
    require(files.nonEmpty, s"graft: no PQ shards under $path")
    val shard = load(files.head,
      spark.sparkContext.hadoopConfiguration)
    (shard.cb, shard.graph.m, shard.graph.efConstruction)
  }

  /** Every live (id, dequantized vector) row across the shards —
    * tombstones masked exactly like [[AnnIndex.vectors]]. */
  def vectors(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val files = listShards(spark, path)
    val sconf = GraftSqlShim.serializableConf(spark.sparkContext.hadoopConfiguration)
    val bannedB = spark.sparkContext.broadcast(
      AnnIndex.tombstoneMask(spark, path))
    val rdd = spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { f =>
        val shard = load(f, sconf.value)
        val b = bannedB.value
        (0 until shard.graph.size).iterator
          .filterNot(n => b.banned(shard.graph.label(n)))
          .map(n => Row(shard.graph.label(n),
            shard.cb.dequantize(
              shard.codes(n).map(x => (x & 0xFF).toShort)).toSeq))
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("id", LongType),
      StructField("vec", ArrayType(FloatType)))))
  }

  /** Rebuild all shards into one fresh artifact, applying tombstones
    * physically ([[AnnIndex.consolidate]]'s shape). The rebuild
    * round-trips each row through its DEQUANTIZED vector — re-encoding
    * is exact (every dequantized point is its own nearest centroid
    * combination), so codes survive the rebuild bit-identically; only
    * graph edges re-form. The recorded metric is preserved; the
    * vectors are already in normalized space for a cos index, so the
    * rebuild itself runs the l2sq machinery like the original build. */
  def consolidate(spark: SparkSession, path: String,
      numPartitions: Int = 0): Unit = {
    val (cb, m, efc) = readCodec(spark, path)
    val metric = metricOf(spark, path)
    val live = vectors(spark, path)
    require(!live.isEmpty,
      s"graft: consolidate would leave an empty PQ index under $path " +
        "(every row tombstoned) — drop and rebuild instead")
    val tmp = path + ".consolidating"
    build(live, "id", "vec", tmp, cb,
      AnnParams(m, efc, metric = "l2sq", numPartitions = numPartitions))
    graft.util.MetaJson.write(spark, s"$tmp/meta.json",
      s"""{"metric":"$metric"}""")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.rename(new Path(tmp), new Path(path))
    ()
  }

  /** Topology + per-node codes + codebook; NO float vectors on disk. */
  private def writeShard(
      out: DataOutputStream, g: HnswGraph, codes: Array[Array[Short]],
      cb: PqCodebook): Unit = {
    out.writeInt(Magic)
    out.writeInt(cb.dim); out.writeInt(g.m); out.writeInt(g.efConstruction)
    out.writeInt(g.size); out.writeInt(g.entryPoint); out.writeInt(g.maxLevel)
    out.writeInt(cb.subvectors); out.writeInt(cb.clusters)
    for (s <- 0 until cb.subvectors; c <- 0 until cb.clusters; j <- 0 until cb.subDim)
      out.writeFloat(cb.centroids(s)(c)(j))
    var n = 0
    while (n < g.size) {
      out.writeLong(g.ids(n))
      out.writeInt(g.nodeLevels(n))
      codes(n).foreach(c => out.writeByte(c & 0xFF))
      var l = 0
      while (l <= g.nodeLevels(n)) {
        val nbrs = g.neighbors(n)(l)
        out.writeInt(nbrs.length)
        nbrs.foreach(out.writeInt)
        l += 1
      }
      n += 1
    }
  }

  private[ann] case class PqShard(
      graph: HnswGraph, codes: Array[Array[Byte]], cb: PqCodebook)

  private def readShard(in: DataInputStream): PqShard = {
    require(in.readInt() == Magic, "graft: not a PQ-HNSW shard")
    val dim = in.readInt(); val m = in.readInt(); val efc = in.readInt()
    val n = in.readInt(); val entry = in.readInt(); val maxLevel = in.readInt()
    val subvectors = in.readInt(); val clusters = in.readInt()
    val subDim = dim / subvectors
    val centroids = Array.tabulate(subvectors, clusters) { (_, _) =>
      val a = new Array[Float](subDim)
      var j = 0
      while (j < subDim) { a(j) = in.readFloat(); j += 1 }
      a
    }
    val cb = PqCodebook(dim, centroids)
    val g = new HnswGraph(dim, m, efc, Metric.L2Sq, seed = 0L)
    g.entryPoint = entry
    g.maxLevel = maxLevel
    val codes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      g.ids += in.readLong()
      val lvl = in.readInt()
      g.nodeLevels += lvl
      val cs = new Array[Byte](subvectors)
      in.readFully(cs)
      codes(i) = cs
      val layers = new Array[scala.collection.mutable.ArrayBuffer[Int]](lvl + 1)
      var l = 0
      while (l <= lvl) {
        val cnt = in.readInt()
        val nbrs = new scala.collection.mutable.ArrayBuffer[Int](cnt)
        var c = 0
        while (c < cnt) { nbrs += in.readInt(); c += 1 }
        layers(l) = nbrs
        l += 1
      }
      g.neighbors += layers
      i += 1
    }
    PqShard(g, codes, cb)
  }

  // LRU-bounded like GraphCache (shards are the dominant memory object)
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, PqShard](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, PqShard]): Boolean = size() > 64
      })

  private def load(file: String, conf: org.apache.hadoop.conf.Configuration): PqShard = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val key = s"$file#${st.getLen}#${st.getModificationTime}"
    var s = cache.get(key)
    if (s == null) {
      val in = new DataInputStream(new BufferedInputStream(fs.open(p), 1 << 20))
      try s = readShard(in) finally in.close()
      cache.put(key, s)
    }
    s
  }

  private def listShards(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path, GraphDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.getPath.getName.endsWith(".pqhnsw"))
      .map(_.getPath.toString).sorted.toSeq
  }

  /** `ambulkdelete` analog, same semantics as [[AnnIndex.delete]]:
    * tombstoned labels append to a parquet dir and every search path
    * masks them in-walk (the graph is untouched, like the reference's
    * label invalidation — delete.c:15-73); exact sets up to
    * [[AnnIndex.ExactTombstoneLimit]], a distributed bloom beyond. */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("id").write.mode("append").parquet(s"$path/tombstones")
  }

  /** `validate_index` analog for the PQ graph shards (reference
    * lantern_hnsw/src/hnsw/validate_index.c:436-528): per-shard
    * structure — every node carries exactly `subvectors` codes, the
    * entry point and every neighbor index land inside the shard, the
    * codebook fits one byte — plus cross-shard header coherence (all
    * shards must agree on (dim, m, efConstruction, subvectors,
    * clusters) AND carry the same codebook: a shard encoded under a
    * drifted codebook scores garbage LUT distances). With `source`
    * supplied, the codec re-derivation: every stored node's codes must
    * equal `quantize(source vector)` under the recorded metric's
    * normalization, every label must have a source row, and every
    * source row must be stored (tombstoned ids excused). Byte codes
    * are structurally within [0, 256); the range check against
    * `clusters` therefore rides the re-derivation (quantize emits
    * `< clusters` by construction). Throws [[IllegalStateException]]
    * naming the FIRST violation; returns the stored node count. */
  def validateIndex(spark: SparkSession, path: String,
      source: Option[(DataFrame, String, String)] = None): Long = {
    val files = listShards(spark, path)
    if (files.isEmpty) throw new IllegalStateException(
      s"graft: pq index $path invalid — no graph shards")
    val sconf = GraftSqlShim.serializableConf(spark.sparkContext.hadoopConfiguration)
    // one task per shard: structural issues come back as messages so
    // the driver throws the FIRST (an executor throw would arrive
    // wrapped in SparkException, breaking the validator contract);
    // the header fingerprint folds the centroid bytes so codebook
    // drift between write generations is caught, not just shape drift
    val perShard = spark.sparkContext
      .parallelize(files, files.size)
      .map { f =>
        val s = load(f, sconf.value)
        val g = s.graph
        var issue: String = null
        if (s.cb.clusters > 256)
          issue = s"shard $f codebook clusters ${s.cb.clusters} > 256"
        else if (g.size > 0 && (g.entryPoint < 0 || g.entryPoint >= g.size))
          issue = s"shard $f entry point ${g.entryPoint} outside [0, ${g.size})"
        var n = 0
        while (n < g.size && issue == null) {
          if (s.codes(n).length != s.cb.subvectors)
            issue = s"shard $f node $n carries ${s.codes(n).length} codes, " +
              s"expected ${s.cb.subvectors}"
          var l = 0
          while (l <= g.nodeLevels(n) && issue == null) {
            val nb = g.neighbors(n)(l)
            var i = 0
            while (i < nb.length && issue == null) {
              if (nb(i) < 0 || nb(i) >= g.size)
                issue = s"shard $f node $n level $l neighbor ${nb(i)} " +
                  s"outside [0, ${g.size})"
              i += 1
            }
            l += 1
          }
          n += 1
        }
        var cbHash = 17L
        for (sv <- s.cb.centroids; c <- sv; j <- c)
          cbHash = cbHash * 31 + java.lang.Float.floatToIntBits(j)
        (f, (s.cb.dim, g.m, g.efConstruction, s.cb.subvectors,
          s.cb.clusters, cbHash), Option(issue), g.size.toLong)
      }.collect()
    perShard.flatMap(_._3).headOption.foreach(i =>
      throw new IllegalStateException(s"graft: pq index $path invalid — $i"))
    val headers = perShard.map(_._2).distinct
    if (headers.length > 1) throw new IllegalStateException(
      s"graft: pq index $path invalid — shard headers disagree: " +
        s"${perShard.head._1} says ${perShard.head._2}, " +
        s"${perShard.find(_._2 != perShard.head._2).get._1} says " +
        s"${perShard.find(_._2 != perShard.head._2).get._2}")
    // label-level checks over one distributed (id, codes) projection
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val codesRdd = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { f =>
        val s = load(f, sconf.value)
        (0 until s.graph.size).iterator.map(n => Row(s.graph.label(n),
          s.codes(n).map(b => (b & 0xFF).toShort).toSeq))
      }
    val stored = spark.createDataFrame(codesRdd, StructType(Seq(
      StructField("id", LongType),
      StructField("codes", ArrayType(ShortType)))))
    val dup = stored.groupBy("id").count().where(col("count") > 1)
      .limit(1).collect()
    if (dup.nonEmpty) throw new IllegalStateException(
      s"graft: pq index $path invalid — duplicate label ${dup.head.getLong(0)}")
    source.foreach { case (df, idCol, vecCol) =>
      val metric = metricOf(spark, path)
      val (cb, _, _) = readCodec(spark, path)
      val rawVec =
        if (metric == "cos")
          GraftSqlShim.column(graft.functions.UnitNormalize(
            GraftSqlShim.expression(col(vecCol))))
        else col(vecCol)
      val cbB = spark.sparkContext.broadcast(cb)
      val quant = udf { v: Seq[Float] => cbB.value.quantize(v.toArray) }
      val expected = df.select(col(idCol).cast(LongType).as("id"),
        quant(rawVec).as("__exp"))
      // serving-set orphan check (tombstoned rows excused — a pending
      // table-first delete is not corruption; see IvfIndex)
      val orphan = FlatArtifact.minusTombstones(spark, path,
          stored.select("id"))
        .join(expected.select("id"), Seq("id"), "left_anti")
        .limit(1).collect()
      if (orphan.nonEmpty) throw new IllegalStateException(
        s"graft: pq index $path invalid — label ${orphan.head.getLong(0)} " +
          "has no source row to re-derive from")
      val missing = FlatArtifact.minusTombstones(spark, path,
          expected.select("id")
            .join(stored.select("id"), Seq("id"), "left_anti"))
        .limit(1).collect()
      if (missing.nonEmpty) throw new IllegalStateException(
        s"graft: pq index $path invalid — source id " +
          s"${missing.head.getLong(0)} is not stored (missing row)")
      val drift = stored.join(expected, Seq("id"))
        .where(!(col("codes") <=> col("__exp")))
        .select("id").limit(1).collect()
      if (drift.nonEmpty) throw new IllegalStateException(
        s"graft: pq index $path invalid — label ${drift.head.getLong(0)}'s " +
          "codes do not re-derive from the persisted codebook")
    }
    // node count already rode the header pass — no extra shard scan
    perShard.map(_._4).sum
  }

  /** Candidate rows for the planner's AnnScanExec: per-shard LUT
    * top-`max(ef, k)` pool (pq never passes storesTrueVectors, so the
    * planner join-backs these ids to the TABLE's float rows and the
    * Sort+Limit above is an EXACT rescore over the pool — `ef` is the
    * recall knob, exactly like the bq/mrl rescore pools; narrowing to
    * k per shard here would cap recall at whatever the 48-bit LUT
    * ranking gets right). The vec column is NULL by design, like
    * [[BqIndex.candidateRows]]: the join-back never reads it, and
    * dequantizing ef × shards vectors only to drop them would pay the
    * pool widening twice. Tombstoned labels are masked inside the
    * walk — a deleted row can never ride a planner candidate path.
    */
  private[graft] def candidateRows(
      spark: SparkSession,
      path: String,
      query: Array[Float],
      k: Int,
      ef: Int): org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] = {
    val files = listShards(spark, path)
    val sconf = GraftSqlShim.serializableConf(spark.sparkContext.hadoopConfiguration)
    val bannedB = spark.sparkContext.broadcast(
      AnnIndex.tombstoneMask(spark, path))
    val qB = spark.sparkContext.broadcast(query)
    val eff = math.max(ef, k)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("vec",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .mapPartitions { fit =>
        val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
        fit.flatMap { f =>
          val shard = load(f, sconf.value)
          val lut = shard.cb.l2sqLut(qB.value)
          val codes = shard.codes
          val nd = (n: Int) => {
            val cs = codes(n)
            var s = 0; var d = 0.0
            while (s < cs.length) { d += lut(s)(cs(s) & 0xFF); s += 1 }
            d
          }
          shard.graph.searchNodesWith(nd, eff, eff, bannedB.value.banned)
            .iterator.map { case (n, _) =>
              proj(org.apache.spark.sql.catalyst.InternalRow(
                shard.graph.label(n), null)).copy()
            }
        }
      }
  }

  /** Top-k with exact re-rank: the LUT graph search pre-selects
    * `max(ef, 4k)` candidates per shard, then the true float column is
    * fetched for just those ids and ranked by exact l2sq — the recall
    * of the index no longer decays with quantization error as the
    * corpus grows. `df` must hold the same rows the index was built on.
    */
  def searchRerank(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      query: Array[Float],
      k: Int,
      ef: Int = 64): Array[(Long, Double)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val nCand = math.max(ef, 4 * k)
    val cands = search(spark, path, query, nCand, math.max(ef, nCand)).map(_._1)
    val candDf = cands.toSeq.toDF("__cand_id")
    df.select(col(idCol).cast(LongType).as("__id"), col(vecCol).as("__v"))
      .join(broadcast(candDf), col("__id") === col("__cand_id"))
      .select(col("__id"),
        graft.functions.l2sq_dist(col("__v"), lit(query)).as("__d"))
      .as[(Long, Double)].collect()
      .sortBy(x => (x._2, x._1))
      .take(k)
  }

  /** Batch PQ search — the kNN-JOIN (LATERAL) path for the in-graph
    * PQ kind, output-compatible with [[AnnIndex.searchMany]]
    * (query_id, neighbor_id, dist, rank ≤ k): all queries broadcast
    * once, ONE pass over the code shards, each task building every
    * query's LUT against its local codebook and answering all queries
    * in that pass. With `rerank` (float source) the per-query LUT
    * top-`max(ef, 4k)` pool re-ranks by exact l2sq over the TABLE's
    * true floats in one broadcast join-back ([[searchRerank]]'s
    * contract, batched).
    */
  def searchMany(
      spark: SparkSession,
      path: String,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      ef: Int = 64,
      rerank: Option[(DataFrame, String, String)] = None,
      metric: String = "l2sq"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    import spark.implicits._
    val files = listShards(spark, path)
    val sconf = GraftSqlShim.serializableConf(spark.sparkContext.hadoopConfiguration)
    val bannedB = spark.sparkContext.broadcast(
      AnnIndex.tombstoneMask(spark, path))
    // a cos index is an l2sq graph over unit vectors — normalize the
    // queries so the LUT measures the cosine-equivalent geometry
    val qn = queries.iterator
      .map { case (qid, q) => (qid, Metric.normalizeIfCos(q, metric)) }
      .toArray
    val qB = spark.sparkContext.broadcast(qn)
    val pool =
      if (rerank.isDefined) math.max(ef, 4 * k) else math.max(ef, k)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { f =>
        val shard = load(f, sconf.value)
        val codes = shard.codes
        qB.value.iterator.flatMap { case (qid, q) =>
          val lut = shard.cb.l2sqLut(q)
          val nd = (n: Int) => {
            val cs = codes(n)
            var s = 0; var d = 0.0
            while (s < cs.length) { d += lut(s)(cs(s) & 0xFF); s += 1 }
            d
          }
          shard.graph.searchNodesWith(nd, pool, pool, bannedB.value.banned)
            .iterator
            .map { case (n, d) => Row(qid, shard.graph.label(n), d) }
        }
      }
    val local = spark.createDataFrame(rdd, StructType(Seq(
      StructField("query_id", LongType),
      StructField("neighbor_id", LongType),
      StructField("dist", DoubleType))))
    rerank match {
      case None =>
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("dist"), col("neighbor_id"))
        local.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      case Some((src, srcId, srcVec)) =>
        // cos: rank by l2sq over unit-normalized source vs the
        // normalized query — cosine ordering, same as IvfPq's rerank
        AnnBatch.rerankPool(local, src, srcId, srcVec, qn.toSeq, k,
          pool = pool, unitNormSrc = metric == "cos")
    }
  }

  /** Top-k under the asymmetric LUT distance (nearest-first),
    * tombstones masked in-walk. */
  def search(
      spark: SparkSession,
      path: String,
      query: Array[Float],
      k: Int,
      ef: Int = 64): Array[(Long, Double)] = {
    val files = listShards(spark, path)
    val sconf = GraftSqlShim.serializableConf(spark.sparkContext.hadoopConfiguration)
    val bannedB = spark.sparkContext.broadcast(
      AnnIndex.tombstoneMask(spark, path))
    val qB = spark.sparkContext.broadcast(query)
    val kk = k; val eff = math.max(ef, k)
    spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { f =>
        val shard = load(f, sconf.value)
        val lut = shard.cb.l2sqLut(qB.value)
        val codes = shard.codes
        val nd = (n: Int) => {
          val cs = codes(n)
          var s = 0; var d = 0.0
          while (s < cs.length) { d += lut(s)(cs(s) & 0xFF); s += 1 }
          d
        }
        shard.graph.searchNodesWith(nd, kk, eff, bannedB.value.banned)
          .iterator
          .map { case (n, dd) => (shard.graph.label(n), dd) }
      }
      .collect()
      .sortBy(x => (x._2, x._1))
      .take(k)
  }
}
