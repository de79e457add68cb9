package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions._

/** Driver-checkable queries for the distance-function / exact-kNN
  * surface (SURVEY.md §2.1, §3.1 oracle path).
  *
  * Every query streams the `embeddings` table once against a one-row
  * broadcast query vector and reduces via `TakeOrderedAndProject`
  * (top-k heap per partition, k·P-row merge) or a partial-agg
  * `groupBy` — both shapes scale linearly with no full-table shuffle.
  */
object VectorQueries {

  /** One-row DF holding the query vector (vec_id = 0's embedding). */
  private def queryRow(e: DataFrame): DataFrame =
    broadcast(e.where(col("vec_id") === 0).select(col("embedding").as("q")))

  private def knn(metric: String)(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val dist = metric match {
      case "l2sq" => l2sq_dist(col("embedding"), col("q"))
      case "cos" => cos_dist(col("embedding"), col("q"))
      case "inner" => -inner_product(col("embedding"), col("q"))
    }
    e.where(col("vec_id") =!= 0)
      .crossJoin(queryRow(e))
      .withColumn("dist", round(dist, 4))
      .orderBy(col("dist"), col("vec_id"))
      .limit(10)
      .select("vec_id", "dist")
  }

  private def knnOracle(distSql: String): String =
    s"""SELECT e.vec_id, $distSql AS dist
       |FROM embeddings e, (SELECT embedding AS q FROM embeddings WHERE vec_id = 0) qr
       |WHERE e.vec_id <> 0
       |ORDER BY dist, e.vec_id
       |LIMIT 10""".stripMargin

  private val l2sqSql =
    "round(list_sum(list_transform(list_zip(e.embedding, qr.q), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))^2)), 4)"
  private val dotSql =
    "list_sum(list_transform(list_zip(e.embedding, qr.q), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
  private def normSql(c: String) =
    s"sqrt(list_sum(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
  private val cosSql =
    s"round(1.0 - $dotSql / (${normSql("e.embedding")} * ${normSql("qr.q")}), 4)"

  /** Sign-bit hamming: embeddings binarized to {0,1} int arrays; the
    * engine's packed-bit hamming then equals the mismatch count. */
  private def knnHamming(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val bits = (c: String) =>
      transform(col(c), x => when(x > 0f, 1).otherwise(0))
    e.where(col("vec_id") =!= 0)
      .crossJoin(queryRow(e))
      .withColumn("hd", hamming_dist(bits("embedding"), bits("q")))
      .orderBy(col("hd"), col("vec_id"))
      .limit(10)
      .select("vec_id", "hd")
  }

  private def aggNorm(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    e.groupBy(col("label"))
      .agg(
        round(avg(vector_norm(col("embedding"))), 4).as("avg_norm"),
        count(lit(1)).as("n"))
      .orderBy(col("label"))
  }

  /** Exact k-NN JOIN (the LATERAL pattern): 3 nearest data rows for
    * EACH of 5 query rows, via broadcast + rank window. */
  private def knnJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    graft.ops.VectorSearch.knnJoinExact(
        e.where(col("vec_id") < 5), "vec_id", "embedding",
        e.where(col("vec_id") >= 5), "vec_id", "embedding",
        k = 3)
      .select(col("query_id"), col("neighbor_id"),
        round(col("dist"), 4).as("dist"), col("rank").cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  private val knnJoinOracle = {
    val l2sq =
      "list_sum(list_transform(list_zip(d.embedding, q.embedding), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))^2))"
    s"""WITH x AS (
       |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
       |    $l2sq AS dist,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $l2sq, d.vec_id) AS rank
       |  FROM embeddings q JOIN embeddings d ON q.vec_id < 5 AND d.vec_id >= 5)
       |SELECT query_id, neighbor_id, round(dist, 4) AS dist, rank
       |FROM x WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("knn_l2sq_exact", Some(knnOracle(l2sqSql)), knn("l2sq")),
    QueryDef("knn_join_exact", Some(knnJoinOracle), knnJoin),
    QueryDef("knn_cos_exact", Some(knnOracle(cosSql)), knn("cos")),
    QueryDef("knn_inner_exact", Some(knnOracle(s"round(-$dotSql, 4)")), knn("inner")),
    QueryDef(
      "knn_hamming_sign",
      Some(
        """SELECT e.vec_id, CAST(list_sum(list_transform(list_zip(e.embedding, qr.q),
          |  p -> CASE WHEN (p[1] > 0) <> (p[2] > 0) THEN 1 ELSE 0 END)) AS INT) AS hd
          |FROM embeddings e, (SELECT embedding AS q FROM embeddings WHERE vec_id = 0) qr
          |WHERE e.vec_id <> 0
          |ORDER BY hd, e.vec_id
          |LIMIT 10""".stripMargin),
      knnHamming),
    QueryDef(
      "vector_norm_agg",
      Some(
        s"""SELECT label, round(avg(${normSql("embedding")}), 4) AS avg_norm, count(*) AS n
           |FROM embeddings
           |GROUP BY label
           |ORDER BY label""".stripMargin),
      aggNorm),
  )
}
