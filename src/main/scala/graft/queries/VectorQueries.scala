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

  /** Retrieval-quality metrics gate: exact kNN top-10 per query scored
    * against deterministic graded judgments — recall@10, MRR@10,
    * nDCG@10 per query, exactly replayed (gains are small powers of
    * two; DCG discounts are driver-computed literals interpolated into
    * BOTH sides, so no engine log2 is in play). */
  private def rankMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val results = graft.ops.VectorSearch.knnJoinExact(
        e.where(col("vec_id") < 3), "vec_id", "embedding",
        e, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val judgments = e.select(col("vec_id").as("doc_id"))
      .crossJoin(Seq(0L, 1L, 2L).toDF("query_id"))
      .withColumn("rel",
        when(pmod(col("doc_id") + col("query_id"), lit(11)) === 0, 2)
          .when(pmod(col("doc_id") + col("query_id"), lit(7)) === 0, 1)
          .otherwise(0))
    def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6
    graft.ops.RankMetrics.evaluate(results, judgments, k = 10)
      .select(col("query_id"), col("n_rel"), col("n_hits"),
        r6(col("recall")).as("recall"), r6(col("mrr")).as("mrr"),
        r6(col("ndcg")).as("ndcg"))
      .orderBy("query_id")
  }

  private val rankMetricsOracle: String = {
    val l2sq =
      "list_sum(list_transform(list_zip(d.embedding, q.embedding), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))^2))"
    val disc = graft.ops.RankMetrics.discounts(10)
      .map(_.toString).mkString("[", ", ", "]")
    s"""WITH res AS (
       |  SELECT * FROM (
       |    SELECT q.vec_id AS query_id, d.vec_id AS doc_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY $l2sq, d.vec_id) AS rank
       |    FROM embeddings q JOIN embeddings d ON q.vec_id < 3)
       |  WHERE rank <= 10
       |), j AS (
       |  SELECT qq.query_id, e.vec_id AS doc_id,
       |    CASE WHEN (e.vec_id + qq.query_id) % 11 = 0 THEN 2
       |         WHEN (e.vec_id + qq.query_id) % 7 = 0 THEN 1
       |         ELSE 0 END AS rel
       |  FROM embeddings e, (VALUES (0), (1), (2)) AS qq(query_id)
       |), jr AS (SELECT * FROM j WHERE rel > 0
       |), gained AS (
       |  SELECT res.query_id,
       |    sum(CASE WHEN coalesce(jr.rel, 0) > 0 THEN 1 ELSE 0 END) AS n_hits,
       |    max(CASE WHEN coalesce(jr.rel, 0) > 0 THEN 1.0 / res.rank END) AS rr,
       |    sum((2 ^ coalesce(jr.rel, 0) - 1) * ($disc)[res.rank]) AS dcg
       |  FROM res LEFT JOIN jr USING (query_id, doc_id)
       |  GROUP BY res.query_id
       |), ideal AS (
       |  SELECT query_id, count(*) AS n_rel,
       |    sum(CASE WHEN ir <= 10 THEN (2 ^ rel - 1) * ($disc)[CAST(ir AS INT)] END) AS idcg
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY rel DESC, doc_id) AS ir FROM jr)
       |  GROUP BY query_id
       |)
       |SELECT g.query_id,
       |  CAST(coalesce(i.n_rel, 0) AS BIGINT) AS n_rel,
       |  CAST(g.n_hits AS BIGINT) AS n_hits,
       |  floor(CASE WHEN coalesce(i.n_rel, 0) = 0 THEN 0.0
       |    ELSE g.n_hits * 1.0 / i.n_rel END * 1e6 + 0.5) / 1e6 AS recall,
       |  floor(coalesce(g.rr, 0.0) * 1e6 + 0.5) / 1e6 AS mrr,
       |  floor(CASE WHEN coalesce(i.idcg, 0.0) = 0.0 THEN 0.0
       |    ELSE g.dcg / i.idcg END * 1e6 + 0.5) / 1e6 AS ndcg
       |FROM gained g LEFT JOIN ideal i USING (query_id)
       |ORDER BY g.query_id""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("knn_l2sq_exact", Some(knnOracle(l2sqSql)), knn("l2sq")),
    QueryDef("knn_join_exact", Some(knnJoinOracle), knnJoin),
    QueryDef("rank_metrics", Some(rankMetricsOracle), rankMetrics),
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
