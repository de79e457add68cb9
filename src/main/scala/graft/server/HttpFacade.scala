package graft.server

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ann.{AnnIndex, AnnParams}
import graft.embed.EmbeddingRuntimes
import graft.ops.VectorSearch

/** HTTP REST façade over the engine — the reference's optional HTTP
  * server (`lantern_cli/src/http_server/`: collections CRUD
  * collection.rs:91-304, vector search search.rs:59-134, index
  * create/drop index.rs:51-117, PQ pq.rs:47). Collections are parquet
  * dirs under `rootDir` with the reference's collection shape
  * (id bigint, vector array<float>, data string); search runs the
  * SAME library operators every other entry point uses — exact kNN by
  * default, the HNSW artifact when one was built for the queried
  * column, and `query_text`+`query_model` embeds through the runtime
  * registry first (search.rs's dynamic-embedding path).
  *
  * Built on the JDK's HttpServer (zero new dependencies; Jackson for
  * JSON rides in Spark's own classpath). Single-threaded handler —
  * Spark is the concurrency layer, and the reference likewise funnels
  * requests through one pool.
  */
final class HttpFacade(
    spark: SparkSession,
    rootDir: String,
    bindPort: Int = 0,
    auth: Option[(String, String)] = None,
    catalogPath: Option[String] = None) {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _

  private val CollectionSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("vector", ArrayType(FloatType)),
    StructField("data", StringType)))

  def port: Int = server.getAddress.getPort

  def start(): HttpFacade = {
    // catalog persistence wired into serving (the reference's index
    // metadata lives in the PG catalog and survives restarts): a
    // restarted server re-loads its planner registrations instead of
    // silently serving exact scans until someone re-registers by hand
    catalogPath.foreach { cp =>
      val p = new Path(cp)
      if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
        graft.plans.AnnCatalog.load(spark, cp)
    }
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", bindPort), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null)
    server.start()
    this
  }

  /** Persist the planner catalog after any route that changed it. */
  private def saveCatalog(): Unit =
    catalogPath.foreach(cp => graft.plans.AnnCatalog.save(spark, cp))

  def stop(): Unit = if (server != null) server.stop(0)

  // ------------------------------------------------------------ routing

  private val CollectionPath = "^/collections/([A-Za-z0-9_-]+)$".r
  private val SearchPath = "^/collections/([A-Za-z0-9_-]+)/search$".r
  private val IndexPath = "^/collections/([A-Za-z0-9_-]+)/index$".r
  private val PqPath = "^/collections/([A-Za-z0-9_-]+)/pq$".r
  private val IndexByName = "^/index/([A-Za-z0-9_-]+)$".r

  /** Optional HTTP basic auth guarding EVERY route, like the
    * reference's server (lantern_cli/src/http_server/mod.rs:61-70,
    * 130-140: credentials from flags, every handler behind the check).
    * Constant-time compare — a timing oracle on credential bytes is a
    * classic basic-auth mistake. */
  private def authorized(ex: HttpExchange): Boolean = auth match {
    case None => true
    case Some((user, pass)) =>
      val expected = java.util.Base64.getEncoder.encodeToString(
        s"$user:$pass".getBytes(StandardCharsets.UTF_8))
      Option(ex.getRequestHeaders.getFirst("Authorization")).exists { h =>
        h.startsWith("Basic ") && java.security.MessageDigest.isEqual(
          h.stripPrefix("Basic ").trim.getBytes(StandardCharsets.UTF_8),
          expected.getBytes(StandardCharsets.UTF_8))
      }
  }

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath
    try {
      if (!authorized(ex)) {
        ex.getResponseHeaders.set("WWW-Authenticate", "Basic realm=\"graft\"")
        respond(ex, 401, """{"error":"unauthorized"}""")
        return
      }
      (method, path) match {
        case ("GET", "/collections") => listCollections(ex)
        case ("POST", "/collections") => createCollection(ex)
        case ("GET", CollectionPath(name)) => getCollection(ex, name)
        case ("PUT", CollectionPath(name)) => insertData(ex, name)
        case ("DELETE", CollectionPath(name)) => deleteCollection(ex, name)
        case ("POST", SearchPath(name)) => search(ex, name)
        case ("POST", IndexPath(name)) => createIndex(ex, name)
        case ("DELETE", IndexByName(idx)) => deleteIndex(ex, idx)
        case ("POST", PqPath(name)) => quantize(ex, name)
        case _ => respond(ex, 404, """{"error":"not found"}""")
      }
    } catch {
      case e: IllegalArgumentException =>
        respond(ex, 400, errJson(e))
      case e: Exception =>
        respond(ex, 500, errJson(e))
    }
  }

  private def errJson(e: Exception): String = {
    val n = mapper.createObjectNode()
    n.put("error", s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
    n.toString
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os: OutputStream = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def body(ex: HttpExchange): JsonNode =
    mapper.readTree(ex.getRequestBody)

  private def fs = new Path(rootDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def colPath(name: String) = new Path(rootDir, s"collections/$name")
  private def idxPath(name: String) = new Path(rootDir, s"indexes/$name")

  private def requireCollection(name: String): String = {
    require(fs.exists(colPath(name)), s"unknown collection '$name'")
    colPath(name).toString
  }

  private def readCollection(name: String): DataFrame =
    spark.read.schema(CollectionSchema).parquet(requireCollection(name))

  // ------------------------------------------------------- collections

  private def listCollections(ex: HttpExchange): Unit = {
    val base = new Path(rootDir, "collections")
    val arr = mapper.createArrayNode()
    if (fs.exists(base)) {
      fs.listStatus(base).filter(_.isDirectory).map(_.getPath.getName)
        .sorted.foreach(arr.add)
    }
    val out = mapper.createObjectNode()
    out.set[JsonNode]("collections", arr)
    respond(ex, 200, out.toString)
  }

  // same charset the route patterns accept — a name that fails this
  // could escape rootDir via '/' or '..' at create time, or create a
  // directory no GET/PUT/DELETE route could ever address again
  private val ValidName = "^[A-Za-z0-9_-]+$".r

  private def createCollection(ex: HttpExchange): Unit = {
    val b = body(ex)
    val name = require_(b, "name").asText()
    require(ValidName.matches(name),
      s"invalid collection name '$name' (allowed: [A-Za-z0-9_-]+)")
    require(!fs.exists(colPath(name)), s"collection '$name' exists")
    spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](), CollectionSchema)
      .write.parquet(colPath(name).toString)
    respond(ex, 200, s"""{"name":"$name"}""")
  }

  private def getCollection(ex: HttpExchange, name: String): Unit = {
    val df = readCollection(name)
    val out = mapper.createObjectNode()
    out.put("name", name)
    out.put("row_count", df.count())
    respond(ex, 200, out.toString)
  }

  private def insertData(ex: HttpExchange, name: String): Unit = {
    requireCollection(name)
    val rowsNode = require_(body(ex), "rows")
    require(rowsNode.isArray, "'rows' must be an array")
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    rowsNode.forEach { r =>
      // an explicit JSON null is a NullNode, not an absent field — both
      // mean SQL NULL here (filterNot(_.isNull)), never the string
      // "null" or a 400 for the batch
      val vec = Option(r.get("vector")).filterNot(_.isNull).map { v =>
        require(v.isArray, "'vector' must be an array of numbers")
        val a = new Array[Float](v.size)
        (0 until v.size).foreach(i => a(i) = numeric(v.get(i), "vector element").floatValue())
        a.toSeq
      }.orNull
      rows.add(org.apache.spark.sql.Row(
        integral(require_(r, "id"), "id").longValue(), vec,
        // asText for plain strings; structured payloads keep their JSON
        Option(r.get("data")).filterNot(_.isNull)
          .map(d => if (d.isTextual) d.asText() else d.toString).orNull))
    }
    val batch = spark.createDataFrame(rows, CollectionSchema)
    batch.write.mode("append").parquet(colPath(name).toString)
    // aminsert analog: existing indexes on this collection get delta
    // shards for the new rows, so inserts stay searchable through the
    // index route (the reference keeps its index in sync on INSERT)
    collectionIndexes(name).foreach { case (idxName, column) =>
      val withVec = batch.where(col(column).isNotNull)
      if (!withVec.isEmpty) {
        val idx = idxPath(idxName).toString
        // append per ARTIFACT LAYOUT — an hnsw-shaped append onto a
        // bq/mrl artifact would corrupt it (their layouts are bits/
        // prefix parquet, not graph shards)
        if (graft.ann.BqIndex.isBq(spark, idx)) {
          graft.ann.BqIndex.append(withVec, "id", column, idx)
          // flat layouts accumulate one file per append — compact past
          // the same threshold the hnsw branch uses, for the same
          // reason (listing/open cost grows linearly with PUT batches).
          // Target file count sized from row volume like that branch —
          // a fixed 1 would leave one giant file and a single-task
          // stage-1 scan at scale
          if (graft.ann.BqIndex.fileCount(spark, idx) >
              graft.GraftConf.annConsolidateShards(spark))
            graft.ann.BqIndex.consolidate(spark, idx,
              numPartitions = compactTargetFiles(name))
        } else if (graft.ann.MrlIndex.isMrl(spark, idx)) {
          graft.ann.MrlIndex.append(withVec, "id", column, idx)
          if (graft.ann.MrlIndex.fileCount(spark, idx) >
              graft.GraftConf.annConsolidateShards(spark))
            graft.ann.MrlIndex.consolidate(spark, idx,
              numPartitions = compactTargetFiles(name))
        } else if (graft.ann.IvfPqIndex.isIvfPq(spark, idx)) {
          // coarse-list layouts: new rows assign to the PERSISTED
          // centroids (and codebook); compaction folds the per-append
          // files back to one per list
          graft.ann.IvfPqIndex.append(withVec, "id", column, idx)
          if (graft.ann.IvfPqIndex.fileCount(spark, idx) >
              graft.GraftConf.annConsolidateShards(spark))
            graft.ann.IvfPqIndex.consolidate(spark, idx)
        } else if (graft.ann.IvfIndex.isIvf(spark, idx)) {
          graft.ann.IvfIndex.append(withVec, "id", column, idx)
          if (graft.ann.IvfIndex.fileCount(spark, idx) >
              graft.GraftConf.annConsolidateShards(spark))
            graft.ann.IvfIndex.consolidate(spark, idx)
        } else if (graft.ann.PqAnnIndex.isPq(spark, idx)) {
          // delta graph shards under the persisted codebook; shard
          // count is the compaction measure, like the hnsw branch
          graft.ann.PqAnnIndex.append(withVec, "id", column, idx,
            metric = graft.ann.PqAnnIndex.metricOf(spark, idx))
          if (graft.ann.PqAnnIndex.shardCount(spark, idx) >
              graft.GraftConf.annConsolidateShards(spark))
            graft.ann.PqAnnIndex.consolidate(spark, idx,
              numPartitions = compactTargetFiles(name))
        } else {
          AnnIndex.append(withVec, "id", column, idx)
          // each append adds delta shards and search fans out one task
          // per shard — a row-at-a-time inserter would otherwise get
          // one graph file per row and linearly growing search
          // latency; compact once the count crosses the conf
          // threshold. Target shard count is sized from row volume
          // (~1M rows ≈ 0.5 GB per shard at 128 dims — the build-time
          // guidance); consolidate's default keeps the current
          // partitioning, i.e. would rebuild the same shard count and
          // never compact
          if (AnnIndex.shardCount(spark, idx) >
              graft.GraftConf.annConsolidateShards(spark)) {
            val rows = spark.read.parquet(colPath(name).toString).count()
            AnnIndex.consolidate(spark, idx,
              numPartitions = math.max(1, math.ceil(rows / 1e6).toInt))
          }
        }
      }
    }
    respond(ex, 200, s"""{"inserted":${rows.size()}}""")
  }

  /** Compaction target file count sized from collection row volume
    * (~1M rows per file, the hnsw branch's shard guidance). */
  private def compactTargetFiles(name: String): Int = {
    val rows = spark.read.parquet(colPath(name).toString).count()
    math.max(1, math.ceil(rows / 1e6).toInt)
  }

  /** This collection's existing index artifacts as (indexName, column).
    * Index names are exactly `<collection>-<column>` for a schema
    * column — enumerated by CONSTRUCTION, not by prefix scan: names may
    * themselves contain '-', so `startsWith("$name-")` would also match
    * a sibling collection `"$name-x"`'s indexes. */
  private def collectionIndexes(name: String): Seq[(String, String)] =
    CollectionSchema.fieldNames.toSeq.map(c => (s"$name-$c", c))
      .filter { case (idxName, _) => fs.exists(idxPath(idxName)) }

  private def deleteCollection(ex: HttpExchange, name: String): Unit = {
    requireCollection(name)
    fs.delete(colPath(name), true)
    // drop dependent artifacts too — a stale index under the same name
    // would silently serve a future re-created collection's searches
    collectionIndexes(name).foreach { case (idxName, _) =>
      fs.delete(idxPath(idxName), true)
    }
    fs.delete(new Path(rootDir, s"pq/$name"), true)
    graft.plans.AnnCatalog.unregister(spark, colPath(name).toString)
    saveCatalog()
    respond(ex, 200, s"""{"deleted":"$name"}""")
  }

  // ------------------------------------------------------------ search

  private def search(ex: HttpExchange, name: String): Unit = {
    val df = readCollection(name)
    val b = body(ex)
    val column = require_(b, "column").asText()
    val k = intOpt(b, "k", graft.GraftConf.annInitK(spark))
    val ef = intOpt(b, "ef", 0)
    val metric = Option(b.get("metric")).map(_.asText()).getOrElse("l2sq") match {
      case "cosine" => "cos" // reference accepts the long form
      case m => m
    }
    val selectCols: Seq[String] = Option(b.get("select"))
      .map(_.asText().split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(CollectionSchema.fieldNames.toSeq)

    val query: Array[Float] = Option(b.get("query_vector")) match {
      case Some(v) =>
        require(v.isArray, "'query_vector' must be an array of numbers")
        val a = new Array[Float](v.size)
        (0 until v.size).foreach(i => a(i) = numeric(v.get(i), "query_vector element").floatValue())
        a
      case None =>
        // search.rs's query_text + query_model path: embed first
        val text = require_(b, "query_text").asText()
        val model = require_(b, "query_model").asText()
        val rt = EmbeddingRuntimes.availableModels
          .find(_._2.name == model)
          .map(m => EmbeddingRuntimes.get(m._1))
          .getOrElse(throw new IllegalArgumentException(s"unknown model '$model'"))
        graft.embed.EmbeddingPipeline.textEmbedding(rt, model, text)
    }

    // route through the index artifact when one exists for this column
    // AND was built under the requested metric — otherwise the exact
    // path answers (an l2sq index must not silently serve a cosine
    // request)
    val idx = idxPath(s"$name-$column")
    val hits =
      if (fs.exists(idx) && graft.ann.BqIndex.isBq(spark, idx.toString) &&
          Set("l2sq", "cos")(metric)) {
        // BQ rescore path: hamming pre-rank over the bits artifact
        // (pool = the ef knob), exact rescore over the pool's true rows
        // — valid for the angular/l2 family only; other metrics fall
        // through to the exact scan below, same mismatch policy as an
        // hnsw artifact under a foreign metric
        val base = graft.GraftConf.annParams(spark)
        val pool = math.max(if (ef > 0) ef else base.ef, 4 * k)
        val cand = graft.ann.BqIndex.candidateIds(
          spark, idx.toString, query, pool)
        VectorSearch.exact(
          df.where(col("id").isin(cand.toIndexedSeq: _*)), col(column),
          query, k, metric, tieBreak = Seq(col("id"))).drop("dist")
      } else if (fs.exists(idx) &&
          graft.ann.MrlIndex.isMrl(spark, idx.toString) &&
          Set("l2sq", "cos")(metric)) {
        // matryoshka rescore path: prefix pre-rank over the m/dim
        // prefix table (pool = the ef knob), exact full-dimension
        // rescore over the pool's true rows — same angular/l2-only
        // policy as the bq route
        val base = graft.GraftConf.annParams(spark)
        val pool = math.max(if (ef > 0) ef else base.ef, 4 * k)
        val cand = graft.ann.MrlIndex.candidateIds(
          spark, idx.toString, query, pool, metric)
        VectorSearch.exact(
          df.where(col("id").isin(cand.toIndexedSeq: _*)), col(column),
          query, k, metric, tieBreak = Seq(col("id"))).drop("dist")
      } else if (fs.exists(idx) &&
          graft.ann.IvfPqIndex.isIvfPq(spark, idx.toString) &&
          graft.ann.IvfPqIndex.metricOf(spark, idx.toString) == metric) {
        // IVF-PQ: partition-pruned ADC scan + exact rerank against the
        // collection's true floats (the search route's rerank arm)
        val base = graft.GraftConf.annParams(spark)
        val ids = graft.ann.IvfPqIndex.search(spark, idx.toString, query,
          k, nprobe = intOpt(b, "nprobe", 8),
          rerank = Some((df.where(col(column).isNotNull), "id", column)),
          ef = math.max(if (ef > 0) ef else base.ef, 4 * k))
          .orderBy(col("dist"), col("id"))
          .select("id").collect().map(_.getLong(0))
        rowsInOrder(df, ids)
      } else if (fs.exists(idx) &&
          graft.ann.IvfIndex.isIvf(spark, idx.toString) &&
          graft.ann.IvfIndex.metricOf(spark, idx.toString) == metric) {
        // IVF: partition-pruned probe of the nprobe nearest lists —
        // exact distances within the probed lists, no rescore needed
        val ids = graft.ann.IvfIndex.search(spark, idx.toString, query,
          k, nprobe = intOpt(b, "nprobe", 8))
          .orderBy(col("dist"), col("id"))
          .select("id").collect().map(_.getLong(0))
        rowsInOrder(df, ids)
      } else if (fs.exists(idx) &&
          graft.ann.PqAnnIndex.isPq(spark, idx.toString) &&
          graft.ann.PqAnnIndex.metricOf(spark, idx.toString) == metric) {
        // PQ: LUT graph pre-rank (pool = the ef knob) + exact rescore
        // over the pool's true rows — the bq/mrl rescore shape
        val base = graft.GraftConf.annParams(spark)
        val pool = math.max(if (ef > 0) ef else base.ef, 4 * k)
        val cand = graft.ann.PqAnnIndex.search(spark, idx.toString,
          graft.ann.Metric.normalizeIfCos(query, metric), pool,
          ef = pool).map(_._1)
        VectorSearch.exact(
          df.where(col("id").isin(cand.toIndexedSeq: _*)), col(column),
          query, k, metric, tieBreak = Seq(col("id"))).drop("dist")
      } else if (fs.exists(idx) &&
          !graft.ann.BqIndex.isBq(spark, idx.toString) &&
          !graft.ann.MrlIndex.isMrl(spark, idx.toString) &&
          !graft.ann.IvfPqIndex.isIvfPq(spark, idx.toString) &&
          !graft.ann.IvfIndex.isIvf(spark, idx.toString) &&
          !graft.ann.PqAnnIndex.isPq(spark, idx.toString) &&
          AnnIndex.readHeader(spark, idx.toString).metric == metric) {
        rowsInOrder(df, AnnIndex.search(spark, idx.toString, query, k,
          efOverride = ef).map(_._1))
      } else {
        VectorSearch.exact(df.where(col(column).isNotNull), col(column),
          query, k, metric, tieBreak = Seq(col("id"))).drop("dist")
      }
    val json = hits.select(selectCols.map(col): _*).toJSON.collect()
    respond(ex, 200, json.mkString("""{"rows":[""", ",", "]}"))
  }

  /** The collection rows for `ids`, in the ids' (nearest-first)
    * order — the fetch-back every index-served search ends with. */
  private def rowsInOrder(df: DataFrame, ids: Array[Long]): DataFrame = {
    val order = ids.zipWithIndex.toMap
    val rows = df.where(col("id").isin(ids.toIndexedSeq: _*))
      .collect().sortBy(r => order(r.getLong(0)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), CollectionSchema)
  }

  // ------------------------------------------------------------- index

  private def createIndex(ex: HttpExchange, name: String): Unit = {
    val df = readCollection(name)
    val b = body(ex)
    val column = Option(b.get("column")).map(_.asText()).getOrElse("vector")
    val metric = Option(b.get("metric")).map(_.asText()).getOrElse("l2sq") match {
      case "cosine" => "cos"
      case m => m
    }
    val idx = s"$name-$column"
    Option(b.get("kind")).map(_.asText()).getOrElse("hnsw") match {
      case "bq" =>
        // binary-quantization artifact (index.rs kind analog): sign-bit
        // signatures + persisted center; served by the BQ rescore path
        require(Set("l2sq", "cos")(metric),
          s"bq indexes serve l2sq/cos, not '$metric'")
        graft.ann.BqIndex.build(df.where(col(column).isNotNull), "id",
          column, idxPath(idx).toString)
      case "mrl" =>
        // matryoshka prefix artifact: zero training, `m` = prefix dim
        // (the codec parameter; served by the prefix rescore path)
        require(Set("l2sq", "cos")(metric),
          s"mrl indexes serve l2sq/cos, not '$metric'")
        graft.ann.MrlIndex.build(df.where(col(column).isNotNull), "id",
          column, m = intOpt(b, "m", 32), idxPath(idx).toString)
      case "ivf" =>
        // coarse-list artifact: persisted centroids + list-partitioned
        // parquet; served by the probed-scan path, appends assign to
        // the PERSISTED centroids
        require(Set("l2sq", "cos", "inner")(metric),
          s"ivf indexes serve l2sq/cos/inner, not '$metric'")
        graft.ann.IvfIndex.build(df.where(col(column).isNotNull), "id",
          column, idxPath(idx).toString,
          nlists = intOpt(b, "nlists", 16), metric = metric)
      case "ivfpq" =>
        require(Set("l2sq", "cos")(metric),
          s"ivfpq indexes serve l2sq/cos, not '$metric'")
        graft.ann.IvfPqIndex.build(df.where(col(column).isNotNull), "id",
          column, idxPath(idx).toString,
          nlists = intOpt(b, "nlists", 16),
          subvectors = intOpt(b, "splits", 8),
          clusters = intOpt(b, "clusters", 256), metric = metric)
      case "pq" =>
        // in-graph PQ: codebook trained here (reference PQ index
        // creation trains or reuses a codebook), codes in the shards,
        // metric recorded in the artifact meta so appends re-encode
        // identically
        require(Set("l2sq", "cos")(metric),
          s"pq indexes serve l2sq/cos, not '$metric'")
        val src = df.where(col(column).isNotNull)
        val trainSrc =
          if (metric == "cos")
            src.select(col("id"),
              org.apache.spark.sql.graftshim.GraftSqlShim.column(
                graft.functions.UnitNormalize(
                  org.apache.spark.sql.graftshim.GraftSqlShim
                    .expression(col(column)))).as(column))
          else src
        val cb = graft.pq.ProductQuantizer.trainCodebook(
          trainSrc, column, clusters = intOpt(b, "clusters", 16),
          subvectors = intOpt(b, "splits", 8))
        val base = graft.GraftConf.annParams(spark)
        graft.ann.PqAnnIndex.build(src, "id", column,
          idxPath(idx).toString, cb,
          AnnParams(
            m = intOpt(b, "m", base.m),
            efConstruction = intOpt(b, "ef_construction", base.efConstruction),
            ef = intOpt(b, "ef", base.ef),
            metric = metric))
      case "hnsw" =>
        val base = graft.GraftConf.annParams(spark)
        val params = AnnParams(
          m = intOpt(b, "m", base.m),
          efConstruction = intOpt(b, "ef_construction", base.efConstruction),
          ef = intOpt(b, "ef", base.ef),
          metric = metric,
          quant = Option(b.get("quant")).map(_.asText()).getOrElse("f32"))
        AnnIndex.build(df.where(col(column).isNotNull), "id", column,
          idxPath(idx).toString, params)
        ()
      case other =>
        throw new IllegalArgumentException(
          s"unknown index kind '$other' (expected hnsw|bq|mrl|ivf|ivfpq|pq)")
    }
    // register in the planner catalog too, so `ORDER BY dist LIMIT k`
    // DataFrame/SQL queries over this collection's parquet rewrite
    // through the new artifact; persisted when the server has a
    // catalog file
    graft.plans.AnnCatalog.register(spark, colPath(name).toString,
      graft.plans.AnnCatalog.IndexMeta(idxPath(idx).toString, "id", column,
        metric, ef = graft.GraftConf.annParams(spark).ef,
        kind = Option(b.get("kind")).map(_.asText()).getOrElse("hnsw")))
    saveCatalog()
    respond(ex, 200, s"""{"index":"$idx"}""")
  }

  private def deleteIndex(ex: HttpExchange, idxName: String): Unit = {
    require(fs.exists(idxPath(idxName)), s"unknown index '$idxName'")
    fs.delete(idxPath(idxName), true)
    // drop the planner registrations of the owning collection (index
    // names are `<collection>-<column>` by construction)
    CollectionSchema.fieldNames.toSeq
      .find(c => idxName.endsWith(s"-$c"))
      .map(c => idxName.dropRight(c.length + 1))
      .foreach { coll =>
        graft.plans.AnnCatalog.unregister(spark, colPath(coll).toString)
        saveCatalog()
      }
    respond(ex, 200, s"""{"deleted":"$idxName"}""")
  }

  // ---------------------------------------------------------------- pq

  private def quantize(ex: HttpExchange, name: String): Unit = {
    val df = readCollection(name).where(col("vector").isNotNull)
    val b = body(ex)
    val splits = intOpt(b, "splits", 8)
    val clusters = intOpt(b, "clusters", 16)
    val cb = graft.pq.ProductQuantizer.trainCodebook(
      df, "vector", clusters = clusters, subvectors = splits)
    val codes = graft.pq.ProductQuantizer.quantizeTable(df, "vector", cb)
    codes.write.mode("overwrite")
      .parquet(new Path(rootDir, s"pq/$name").toString)
    val out = mapper.createObjectNode()
    out.put("collection", name)
    out.put("splits", splits)
    out.put("clusters", clusters)
    respond(ex, 200, out.toString)
  }

  private def require_(n: JsonNode, field: String): JsonNode =
    Option(n.get(field)).getOrElse(
      throw new IllegalArgumentException(s"missing field '$field'"))

  /** Jackson's longValue()/floatValue() COERCE non-numeric nodes to 0 —
    * a string id would silently land every such row at id=0. Demand an
    * actual JSON number. */
  private def numeric(n: JsonNode, what: String): JsonNode = {
    require(n.isNumber, s"$what must be a JSON number, got: $n")
    n
  }

  /** Like [[numeric]] but for integral contexts: {"id": 1.9} must be a
    * 400, not a silent truncation to 1 (whole-valued doubles like 2.0
    * still pass — no fraction is lost). */
  private def integral(n: JsonNode, what: String): JsonNode = {
    require(n.isNumber && n.canConvertToExactIntegral,
      s"$what must be an integral JSON number, got: $n")
    n
  }

  /** Optional int field with the same strictness ({"k":"10"} must be a
    * 400, not a silent k=0 search). */
  private def intOpt(b: JsonNode, field: String, default: Int): Int =
    Option(b.get(field)).filterNot(_.isNull)
      .map(integral(_, s"'$field'").intValue()).getOrElse(default)
}
