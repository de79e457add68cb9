package graft.queries

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-checkable query for the HTTP REST façade (the reference's
  * optional http_server): the embeddings table is pushed through the
  * real socket API — create collection, batched inserts, POST search —
  * and the returned ranking must equal DuckDB's exact kNN. This gates
  * the façade end-to-end (routing, JSON row codec, search semantics),
  * not just its unit spec.
  */
object HttpQueries {

  /** Rows pushed through the facade (a deterministic id prefix) — the
    * gate's cost stays constant across scale factors: the point is the
    * socket/codec/search semantics, not re-uploading the whole table
    * over HTTP at every scale. */
  private val UploadIds = 2000L

  private def httpKnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-httpq")
    val facade = new graft.server.HttpFacade(s, root.toString).start()
    try {
      val client = HttpClient.newHttpClient()
      def send(method: String, path: String, body: String): String = {
        val resp = client.send(
          HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${facade.port}$path"))
            .method(method, HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"graft: facade $method $path -> ${resp.statusCode()}: ${resp.body().take(200)}")
        resp.body()
      }

      send("POST", "/collections", """{"name":"emb"}""")
      val rows = Tables.embeddings(s, dir)
        .where(col("vec_id") < UploadIds)
        .select(col("vec_id"), col("embedding")).collect()
      rows.grouped(1000).foreach { batch =>
        val json = batch.map { r =>
          val v = r.getSeq[Float](1).mkString("[", ",", "]")
          s"""{"id":${r.getLong(0)},"vector":$v}"""
        }.mkString("""{"rows":[""", ",", "]}")
        send("PUT", "/collections/emb", json)
      }

      val q = rows.find(_.getLong(0) == 0L).get.getSeq[Float](1)
      val body = send("POST", "/collections/emb/search",
        s"""{"column":"vector","query_vector":${q.mkString("[", ",", "]")},
           |"k":10,"select":"id"}""".stripMargin.replace("\n", ""))
      // response: {"rows":[{"id":..},...]} nearest-first
      val ids = """"id":(\d+)""".r.findAllMatchIn(body)
        .map(_.group(1).toLong).toSeq
      require(ids.nonEmpty, s"graft: empty facade response: ${body.take(200)}")
      ids.zipWithIndex.map { case (id, i) => (i + 1, id) }
        .toDF("rank", "vec_id")
    } finally {
      facade.stop()
      // the facade's workspace holds a parquet copy of the uploaded
      // rows — same Hadoop-fs cleanup idiom as Autotune's trial dirs
      try {
        val p = new org.apache.hadoop.fs.Path(root.toString)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        ()
      } catch { case _: java.io.IOException => () }
    }
  }

  private val httpKnnOracle =
    s"""SELECT CAST(row_number() OVER (ORDER BY d, vec_id) AS INT) AS rank, vec_id
      |FROM (
      |  SELECT b.vec_id,
      |    list_sum(list_transform(list_zip(b.embedding, q.embedding),
      |      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
      |         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS d
      |  FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      |  WHERE b.vec_id < $UploadIds
      |)
      |ORDER BY rank LIMIT 10""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("http_knn", Some(httpKnnOracle), httpKnn),
  )
}
