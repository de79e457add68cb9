package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkTestBase
import graft.embed.HashEmbeddingRuntime

/** End-to-end REST façade: collections CRUD, insert, exact search,
  * text+model search, index build → ANN-routed search, PQ — all over a
  * real HTTP socket.
  */
class HttpFacadeSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {

  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft-http").toString
  private lazy val facade = new HttpFacade(spark, root).start()
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = {
    facade.stop()
    super.afterAll()
  }

  private def req(method: String, path: String, body: String = ""): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${facade.port}$path"))
    val r = method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
    }
    val resp = client.send(r.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def vecJson(v: Seq[Float]): String = v.mkString("[", ",", "]")

  // deterministic 8-dim vectors: doc i points mostly along axis i%8
  private def vec(i: Int): Seq[Float] =
    (0 until 8).map(j => if (j == i % 8) 1.0f + i * 0.01f else 0.05f * ((i + j) % 3))

  test("collections lifecycle + search (exact, text-model, ANN, PQ)") {
    // create + duplicate rejected
    assert(req("POST", "/collections", """{"name":"docs"}""")._1 == 200)
    assert(req("POST", "/collections", """{"name":"docs"}""")._1 == 400)
    assert(req("GET", "/collections")._2.contains("\"docs\""))

    // insert 40 rows (2 batches — append semantics)
    def rowsJson(ids: Range): String = ids.map { i =>
      s"""{"id":$i,"vector":${vecJson(vec(i))},"data":"doc-$i"}"""
    }.mkString("""{"rows":[""", ",", "]}")
    assert(req("PUT", "/collections/docs", rowsJson(0 until 20))._1 == 200)
    assert(req("PUT", "/collections/docs", rowsJson(20 until 40))._1 == 200)
    assert(req("GET", "/collections/docs")._2.contains("\"row_count\":40"))

    // exact search: query = vec(5) must return id 5 first
    val (sc, sb) = req("POST", "/collections/docs/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(5))},"k":3,"select":"id,data"}""")
    assert(sc == 200, sb)
    assert(sb.startsWith("""{"rows":[{"id":5,"data":"doc-5"}"""), sb)

    // cosine metric accepted under its long name
    assert(req("POST", "/collections/docs/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(7))},"metric":"cosine","k":1}""")._1 == 200)

    // query_text + query_model path (deterministic runtime): the
    // nearest row to embed("needle") must be a row holding exactly that
    // embedding — insert it first
    val needle = HashEmbeddingRuntime.embed("needle", 8).toSeq
    assert(req("PUT", "/collections/docs",
      s"""{"rows":[{"id":999,"vector":${vecJson(needle)},"data":"needle-doc"}]}""")._1 == 200)
    val (tc, tb) = req("POST", "/collections/docs/search",
      """{"column":"vector","query_text":"needle","query_model":"mock/tiny","k":1,"select":"id"}""")
    assert(tc == 200, tb)
    assert(tb.contains("\"id\":999"), tb)

    // build an HNSW index; search must now route through it and still
    // find the exact nearest row
    assert(req("POST", "/collections/docs/index",
      """{"column":"vector","metric":"l2sq","m":8,"ef_construction":64,"ef":64}""")._1 == 200)
    val (ac, ab) = req("POST", "/collections/docs/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(5))},"k":3,"select":"id"}""")
    assert(ac == 200, ab)
    assert(ab.startsWith("""{"rows":[{"id":5}"""), ab)

    // a metric the index was NOT built under falls back to the exact
    // path (an l2sq artifact must not serve a cosine request) — same
    // nearest row either way here, but the route must not error
    val (mc, mb) = req("POST", "/collections/docs/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(5))},"metric":"cosine","k":1,"select":"id"}""")
    assert(mc == 200, mb)
    assert(mb.contains("\"id\":5"), mb)

    // rows inserted AFTER the index build get delta shards (aminsert
    // analog) and are found through the index route
    val lateVec = (0 until 8).map(j => if (j == 2) 9.5f else 0.0f)
    assert(req("PUT", "/collections/docs",
      s"""{"rows":[{"id":1000,"vector":${vecJson(lateVec)},"data":"late"}]}""")._1 == 200)
    val (lc, lb) = req("POST", "/collections/docs/search",
      s"""{"column":"vector","query_vector":${vecJson(lateVec)},"k":1,"select":"id"}""")
    assert(lc == 200, lb)
    assert(lb.contains("\"id\":1000"), lb)

    // PQ quantization endpoint
    val (pc, pb) = req("POST", "/collections/docs/pq",
      """{"splits":4,"clusters":8}""")
    assert(pc == 200, pb)
    assert(spark.read.parquet(s"$root/pq/docs").columns.contains("vector_pq"))

    // deleting the collection cascades to its indexes and PQ output —
    // a recreated same-name collection must not serve stale artifacts
    assert(req("DELETE", "/collections/docs")._1 == 200)
    assert(req("GET", "/collections/docs")._1 == 400)
    assert(req("DELETE", "/index/docs-vector")._1 == 400) // already gone
    assert(req("POST", "/collections", """{"name":"docs"}""")._1 == 200)
    assert(req("PUT", "/collections/docs",
      s"""{"rows":[{"id":1,"vector":${vecJson(vec(1))},"data":"fresh"}]}""")._1 == 200)
    val (rc, rb) = req("POST", "/collections/docs/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(5))},"k":1,"select":"id,data"}""")
    assert(rc == 200, rb)
    assert(rb.contains("\"data\":\"fresh\""), rb) // only the new row exists
    assert(req("DELETE", "/collections/docs")._1 == 200)
  }

  test("bq index kind: create routes search through BQ rescore; inner rejected") {
    assert(req("POST", "/collections", """{"name":"bqc"}""")._1 == 200)
    def rowsJson(ids: Range): String = ids.map { i =>
      s"""{"id":$i,"vector":${vecJson(vec(i))},"data":"doc-$i"}"""
    }.mkString("""{"rows":[""", ",", "]}")
    assert(req("PUT", "/collections/bqc", rowsJson(0 until 40))._1 == 200)

    // unknown kind is a 400; bq under inner is a 400
    assert(req("POST", "/collections/bqc/index",
      """{"column":"vector","kind":"nope"}""")._1 == 400)
    assert(req("POST", "/collections/bqc/index",
      """{"column":"vector","kind":"bq","metric":"inner"}""")._1 == 400)

    // build bq; search with ef >= corpus is the EXACT rescore
    assert(req("POST", "/collections/bqc/index",
      """{"column":"vector","kind":"bq"}""")._1 == 200)
    val (sc, sb) = req("POST", "/collections/bqc/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(5))},"k":3,"ef":40,"select":"id"}""")
    assert(sc == 200, sb)
    assert(sb.startsWith("""{"rows":[{"id":5}"""), sb)
    // cosine rides the same artifact; inner falls back to the EXACT
    // scan (same mismatch policy as hnsw under a foreign metric —
    // never a silently wrong metric, never an error)
    assert(req("POST", "/collections/bqc/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(7))},"metric":"cosine","k":1,"ef":40}""")._1 == 200)
    val (ic, ib) = req("POST", "/collections/bqc/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(7))},"metric":"inner","k":1,"select":"id"}""")
    assert(ic == 200, ib)
    assert(ib.contains("\"id\":"), ib)
    // an INSERT after the index exists appends per the bq LAYOUT
    // (sign-bit packing with the persisted center, not graph shards)
    // and the new row is immediately searchable
    assert(req("PUT", "/collections/bqc",
      s"""{"rows":[{"id":99,"vector":${vecJson(vec(99))},"data":"fresh"}]}""")._1 == 200)
    val (nc, nb) = req("POST", "/collections/bqc/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(99))},"k":1,"ef":64,"select":"id,data"}""")
    assert(nc == 200, nb)
    assert(nb.contains("\"data\":\"fresh\""), nb)
    assert(req("DELETE", "/collections/bqc")._1 == 200)
  }

  test("mrl index kind: prefix rescore route; inserts append per layout") {
    assert(req("POST", "/collections", """{"name":"mrlc"}""")._1 == 200)
    def rowsJson(ids: Range): String = ids.map { i =>
      s"""{"id":$i,"vector":${vecJson(vec(i))},"data":"doc-$i"}"""
    }.mkString("""{"rows":[""", ",", "]}")
    assert(req("PUT", "/collections/mrlc", rowsJson(0 until 40))._1 == 200)
    // mrl under inner is a 400 (prefix pre-rank serves l2/angular only)
    assert(req("POST", "/collections/mrlc/index",
      """{"column":"vector","kind":"mrl","metric":"inner"}""")._1 == 400)
    assert(req("POST", "/collections/mrlc/index",
      """{"column":"vector","kind":"mrl","m":4}""")._1 == 200)
    // search with ef >= corpus is the EXACT rescore
    val (sc, sb) = req("POST", "/collections/mrlc/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(5))},"k":3,"ef":40,"select":"id"}""")
    assert(sc == 200, sb)
    assert(sb.startsWith("""{"rows":[{"id":5}"""), sb)
    // an INSERT after the index exists appends per the mrl LAYOUT
    // (an hnsw-shaped append would corrupt the prefix artifact) and
    // the new row is immediately searchable through the index route
    assert(req("PUT", "/collections/mrlc",
      s"""{"rows":[{"id":99,"vector":${vecJson(vec(99))},"data":"fresh"}]}""")._1 == 200)
    val (nc, nb) = req("POST", "/collections/mrlc/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(99))},"k":1,"ef":64,"select":"id,data"}""")
    assert(nc == 200, nb)
    assert(nb.contains("\"data\":\"fresh\""), nb)
    assert(req("DELETE", "/collections/mrlc")._1 == 200)
  }

  test("errors: unknown collection, bad body, missing fields") {
    assert(req("POST", "/collections/nope/search",
      """{"column":"vector","query_vector":[1]}""")._1 == 400)
    assert(req("POST", "/collections", """{}""")._1 == 400)
    assert(req("GET", "/nothing/here")._1 == 404)
  }

  test("collection names outside the route charset are rejected at create") {
    // '/' or '..' would escape rootDir (or create collections no other
    // route could ever address); both must 400 and leave no directory
    assert(req("POST", "/collections", """{"name":"../evil"}""")._1 == 400)
    assert(req("POST", "/collections", """{"name":"a/b"}""")._1 == 400)
    assert(req("POST", "/collections", """{"name":""}""")._1 == 400)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "collections", "a")))
    assert(!new java.io.File(new java.io.File(root).getParentFile, "evil").exists())
  }

  test("non-numeric id / vector values are a 400, not a silent 0") {
    assert(req("POST", "/collections", """{"name":"strict"}""")._1 == 200)
    assert(req("PUT", "/collections/strict",
      """{"rows":[{"id":"7","vector":[0.1],"data":"x"}]}""")._1 == 400)
    assert(req("PUT", "/collections/strict",
      s"""{"rows":[{"id":7,"vector":[0.1,"x"],"data":"x"}]}""")._1 == 400)
    // nothing landed at id 0
    assert(req("GET", "/collections/strict")._2.contains("\"row_count\":0"))
    // string k must be a 400, not a silent k=0 empty search
    assert(req("PUT", "/collections/strict",
      s"""{"rows":[{"id":1,"vector":${vecJson(vec(1))},"data":"a"}]}""")._1 == 200)
    assert(req("POST", "/collections/strict/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(1))},"k":"3"}""")._1 == 400)
    // fractional id/k are a 400, not a silent truncation
    assert(req("PUT", "/collections/strict",
      s"""{"rows":[{"id":1.9,"vector":${vecJson(vec(1))},"data":"a"}]}""")._1 == 400)
    assert(req("POST", "/collections/strict/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(1))},"k":2.5}""")._1 == 400)
    // explicit JSON nulls are SQL NULL, not the string "null" / a 400
    assert(req("PUT", "/collections/strict",
      """{"rows":[{"id":2,"vector":null,"data":null}]}""")._1 == 200)
    val stored = spark.read.parquet(s"$root/collections/strict")
      .where(org.apache.spark.sql.functions.col("id") === 2)
      .select("vector", "data").head()
    assert(stored.isNullAt(0) && stored.isNullAt(1), stored.toString)
    assert(req("DELETE", "/collections/strict")._1 == 200)
  }

  test("basic auth guards every route; correct credentials pass") {
    val authFacade = new HttpFacade(spark,
      java.nio.file.Files.createTempDirectory("graft-http-auth").toString,
      auth = Some(("admin", "s3cret"))).start()
    try {
      def areq(method: String, path: String, body: String = "",
          header: Option[String] = None): (Int, String) = {
        val b = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${authFacade.port}$path"))
        header.foreach(h => b.header("Authorization", h))
        val r = method match {
          case "GET" => b.GET()
          case "DELETE" => b.DELETE()
          case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
        }
        val resp = client.send(r.build(), HttpResponse.BodyHandlers.ofString())
        (resp.statusCode(), resp.body())
      }
      def basic(user: String, pass: String): String =
        "Basic " + java.util.Base64.getEncoder.encodeToString(
          s"$user:$pass".getBytes("UTF-8"))
      // no credentials → 401 with the challenge header, on EVERY route
      val (noC, _) = areq("GET", "/collections")
      assert(noC == 401)
      assert(areq("POST", "/collections", """{"name":"x"}""")._1 == 401)
      assert(areq("POST", "/collections/x/search",
        """{"column":"vector","query_vector":[1]}""")._1 == 401)
      assert(areq("DELETE", "/collections/x")._1 == 401)
      // wrong password / wrong user / malformed scheme → 401
      assert(areq("GET", "/collections",
        header = Some(basic("admin", "wrong")))._1 == 401)
      assert(areq("GET", "/collections",
        header = Some(basic("other", "s3cret")))._1 == 401)
      assert(areq("GET", "/collections",
        header = Some("Bearer abc"))._1 == 401)
      // correct credentials → full lifecycle works
      val ok = Some(basic("admin", "s3cret"))
      assert(areq("GET", "/collections", header = ok)._1 == 200)
      assert(areq("POST", "/collections", """{"name":"guarded"}""",
        header = ok)._1 == 200)
      assert(areq("PUT", "/collections/guarded",
        s"""{"rows":[{"id":1,"vector":${vecJson(vec(1))},"data":"a"}]}""",
        header = ok)._1 == 200)
      assert(areq("DELETE", "/collections/guarded", header = ok)._1 == 200)
    } finally authFacade.stop()
  }

  test("row-at-a-time inserts trigger consolidation: shard count stays bounded") {
    spark.conf.set(graft.GraftConf.AnnConsolidateShards, "4")
    try {
      assert(req("POST", "/collections", """{"name":"drip"}""")._1 == 200)
      // seed + index (index build shards count toward the artifact)
      val seed = (0 until 20).map { i =>
        s"""{"id":$i,"vector":${vecJson(vec(i))},"data":"d-$i"}"""
      }.mkString("""{"rows":[""", ",", "]}")
      assert(req("PUT", "/collections/drip", seed)._1 == 200)
      assert(req("POST", "/collections/drip/index",
        """{"column":"vector","m":8,"ef_construction":64}""")._1 == 200)
      // 12 single-row PUTs: without compaction this means 12 delta
      // shards on top of the base — with the threshold at 4 the shard
      // count must stay bounded by it (compaction resets to numParts)
      (100 until 112).foreach { i =>
        assert(req("PUT", "/collections/drip",
          s"""{"rows":[{"id":$i,"vector":${vecJson(vec(i))},"data":"late-$i"}]}""")._1 == 200)
      }
      val idxDir = s"$root/indexes/drip-vector"
      val shards = graft.ann.AnnIndex.shardCount(spark, idxDir)
      assert(shards <= 5, s"consolidation did not bound shards: $shards")
      // every dripped row is still searchable through the index route
      val probe = vec(107)
      val (c, b) = req("POST", "/collections/drip/search",
        s"""{"column":"vector","query_vector":${vecJson(probe)},"k":1,"select":"id"}""")
      assert(c == 200, b)
      assert(b.contains("\"id\":107"), b)
      assert(req("DELETE", "/collections/drip")._1 == 200)
    } finally spark.conf.unset(graft.GraftConf.AnnConsolidateShards)
  }

  test("ivf index kind: probed-scan route; inserts append per layout") {
    assert(req("POST", "/collections", """{"name":"ivfc"}""")._1 == 200)
    def rowsJson(ids: Range): String = ids.map { i =>
      s"""{"id":$i,"vector":${vecJson(vec(i))},"data":"doc-$i"}"""
    }.mkString("""{"rows":[""", ",", "]}")
    assert(req("PUT", "/collections/ivfc", rowsJson(0 until 40))._1 == 200)
    assert(req("POST", "/collections/ivfc/index",
      """{"column":"vector","kind":"ivf","nlists":4}""")._1 == 200)
    val idxDir = s"$root/indexes/ivfc-vector"
    assert(graft.ann.IvfIndex.isIvf(spark, idxDir))
    // nprobe >= nlists probes every list — the route is exact here
    val (sc, sb) = req("POST", "/collections/ivfc/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(5))},"k":3,"nprobe":4,"select":"id"}""")
    assert(sc == 200, sb)
    assert(sb.startsWith("""{"rows":[{"id":5}"""), sb)
    // INSERT after the index exists appends per the ivf LAYOUT (rows
    // assigned to the PERSISTED centroids) and is immediately served;
    // the artifact stays a valid ivf index afterwards
    assert(req("PUT", "/collections/ivfc",
      s"""{"rows":[{"id":99,"vector":${vecJson(vec(99))},"data":"fresh"}]}""")._1 == 200)
    val (nc, nb) = req("POST", "/collections/ivfc/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(99))},"k":1,"nprobe":4,"select":"id,data"}""")
    assert(nc == 200, nb)
    assert(nb.contains("\"data\":\"fresh\""), nb)
    assert(graft.ann.IvfIndex.validateIndex(spark, idxDir) == 41)
    // a foreign metric falls back to the exact scan, never an error
    assert(req("POST", "/collections/ivfc/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(5))},"metric":"cosine","k":1}""")._1 == 200)
    assert(req("DELETE", "/collections/ivfc")._1 == 200)
  }

  test("ivfpq index kind: ADC + exact-rerank route; inserts append per layout") {
    assert(req("POST", "/collections", """{"name":"ipqc"}""")._1 == 200)
    def rowsJson(ids: Range): String = ids.map { i =>
      s"""{"id":$i,"vector":${vecJson(vec(i))},"data":"doc-$i"}"""
    }.mkString("""{"rows":[""", ",", "]}")
    assert(req("PUT", "/collections/ipqc", rowsJson(0 until 40))._1 == 200)
    // inner is rejected for ivfpq (residual codes serve l2/angular)
    assert(req("POST", "/collections/ipqc/index",
      """{"column":"vector","kind":"ivfpq","metric":"inner"}""")._1 == 400)
    assert(req("POST", "/collections/ipqc/index",
      """{"column":"vector","kind":"ivfpq","nlists":4,"splits":4,"clusters":8}""")._1 == 200)
    val idxDir = s"$root/indexes/ipqc-vector"
    assert(graft.ann.IvfPqIndex.isIvfPq(spark, idxDir))
    // full probe + wide rerank over the true floats → exact here
    val (sc, sb) = req("POST", "/collections/ipqc/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(5))},"k":3,"nprobe":4,"ef":64,"select":"id"}""")
    assert(sc == 200, sb)
    assert(sb.startsWith("""{"rows":[{"id":5}"""), sb)
    // INSERT appends per the ivfpq LAYOUT (persisted centroids AND
    // codebook encode the new rows) and is immediately served
    assert(req("PUT", "/collections/ipqc",
      s"""{"rows":[{"id":99,"vector":${vecJson(vec(99))},"data":"fresh"}]}""")._1 == 200)
    val (nc, nb) = req("POST", "/collections/ipqc/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(99))},"k":1,"nprobe":4,"ef":64,"select":"id,data"}""")
    assert(nc == 200, nb)
    assert(nb.contains("\"data\":\"fresh\""), nb)
    assert(graft.ann.IvfPqIndex.validateIndex(spark, idxDir) == 41)
    assert(req("DELETE", "/collections/ipqc")._1 == 200)
  }

  test("pq index kind: LUT pre-rank + exact rescore route; inserts append per layout") {
    assert(req("POST", "/collections", """{"name":"pqc"}""")._1 == 200)
    def rowsJson(ids: Range): String = ids.map { i =>
      s"""{"id":$i,"vector":${vecJson(vec(i))},"data":"doc-$i"}"""
    }.mkString("""{"rows":[""", ",", "]}")
    assert(req("PUT", "/collections/pqc", rowsJson(0 until 40))._1 == 200)
    assert(req("POST", "/collections/pqc/index",
      """{"column":"vector","kind":"pq","splits":4,"clusters":8,"m":8,"ef_construction":64}""")._1 == 200)
    val idxDir = s"$root/indexes/pqc-vector"
    assert(graft.ann.PqAnnIndex.isPq(spark, idxDir))
    // pool >= corpus → the exact rescore decides the order
    val (sc, sb) = req("POST", "/collections/pqc/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(5))},"k":3,"ef":64,"select":"id"}""")
    assert(sc == 200, sb)
    assert(sb.startsWith("""{"rows":[{"id":5}"""), sb)
    // INSERT appends per the pq LAYOUT (delta graph shards quantized
    // with the PERSISTED codebook, under the recorded metric) and is
    // immediately served
    assert(req("PUT", "/collections/pqc",
      s"""{"rows":[{"id":99,"vector":${vecJson(vec(99))},"data":"fresh"}]}""")._1 == 200)
    val (nc, nb) = req("POST", "/collections/pqc/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(99))},"k":1,"ef":64,"select":"id,data"}""")
    assert(nc == 200, nb)
    assert(nb.contains("\"data\":\"fresh\""), nb)
    assert(graft.ann.PqAnnIndex.validateIndex(spark, idxDir) == 41)
    assert(req("DELETE", "/collections/pqc")._1 == 200)
  }

  test("catalog survives a server restart: planner rewrites resume from the file") {
    import org.apache.spark.sql.functions.{col, lit}
    val rroot = java.nio.file.Files
      .createTempDirectory("graft-http-restart").toString
    val catFile = s"$rroot/catalog.json"
    val f1 = new HttpFacade(spark, rroot, catalogPath = Some(catFile)).start()
    try {
      assert(req2(f1, "POST", "/collections", """{"name":"persisted"}""")._1 == 200)
      val rows = (0 until 40).map { i =>
        s"""{"id":$i,"vector":${vecJson(vec(i))},"data":"doc-$i"}"""
      }.mkString("""{"rows":[""", ",", "]}")
      assert(req2(f1, "PUT", "/collections/persisted", rows)._1 == 200)
      assert(req2(f1, "POST", "/collections/persisted/index",
        """{"column":"vector","m":8,"ef_construction":64}""")._1 == 200)
      assert(new java.io.File(catFile).exists(), "createIndex must persist")
    } finally f1.stop()

    // simulate the restart: the in-session registry forgets everything
    val tablePath = s"$rroot/collections/persisted"
    graft.plans.AnnCatalog.unregister(spark, tablePath)
    def knn = spark.read.parquet(tablePath)
      .orderBy(graft.functions.l2sq_dist(col("vector"), lit(vec(5).toArray)))
      .limit(3)
    def planned = knn.queryExecution.optimizedPlan.collect {
      case a: graft.plans.AnnScanLogical => a
    }.nonEmpty
    assert(!planned, "cleared registry must stop the rewrite")

    // a fresh server loading the same catalog file restores the
    // registration — the planner rewrite AND the search route both work
    val f2 = new HttpFacade(spark, rroot, catalogPath = Some(catFile)).start()
    try {
      assert(planned, "reloaded catalog must restore the rewrite")
      assert(knn.select("id").collect().map(_.getLong(0)).headOption
        .contains(5L))
      val (sc, sb) = req2(f2, "POST", "/collections/persisted/search",
        s"""{"column":"vector","query_vector":${vecJson(vec(5))},"k":1,"select":"id"}""")
      assert(sc == 200, sb)
      assert(sb.contains("\"id\":5"), sb)
      // dropping the INDEX unregisters AND persists the removal
      assert(req2(f2, "DELETE", "/index/persisted-vector")._1 == 200)
      assert(!planned, "index drop must clear the registration")
    } finally f2.stop()
    // a THIRD server must not resurrect the dropped registration
    val f3 = new HttpFacade(spark, rroot, catalogPath = Some(catFile)).start()
    try {
      assert(!planned, "dropped registration must stay dropped after reload")
      assert(req2(f3, "DELETE", "/collections/persisted")._1 == 200)
    } finally f3.stop()
  }

  /** `req` against an explicit facade (the restart test runs several). */
  private def req2(f: HttpFacade, method: String, path: String,
      body: String = ""): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${f.port}$path"))
    val r = method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
    }
    val resp = client.send(r.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("deleting a collection leaves a dash-sharing sibling's index intact") {
    // "docs2" and "docs2-old": names may contain '-', so a prefix scan
    // for docs2's artifacts would also match docs2-old-vector
    assert(req("POST", "/collections", """{"name":"docs2"}""")._1 == 200)
    assert(req("POST", "/collections", """{"name":"docs2-old"}""")._1 == 200)
    def fill(c: String): Unit = {
      val rows = (0 until 30).map { i =>
        s"""{"id":$i,"vector":${vecJson(vec(i))},"data":"$c-$i"}"""
      }.mkString("""{"rows":[""", ",", "]}")
      assert(req("PUT", s"/collections/$c", rows)._1 == 200)
    }
    fill("docs2"); fill("docs2-old")
    assert(req("POST", "/collections/docs2-old/index",
      """{"column":"vector","m":8,"ef_construction":64}""")._1 == 200)
    assert(req("DELETE", "/collections/docs2")._1 == 200)
    // the sibling's artifact survived and still routes its searches
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "indexes", "docs2-old-vector")))
    val (c, b) = req("POST", "/collections/docs2-old/search",
      s"""{"column":"vector","query_vector":${vecJson(vec(5))},"k":1,"select":"id"}""")
    assert(c == 200, b)
    assert(b.contains("\"id\":5"), b)
    assert(req("DELETE", "/collections/docs2-old")._1 == 200)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "indexes", "docs2-old-vector")))
  }
}
