package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TfIdf

/** Driver-checkable queries for the hashed TF-IDF surface
  * ([[graft.text.TfIdf]]): sparse normalized weights and the
  * inverted-index cosine similarity join, replayed end-to-end in SQL
  * (polyhash31 buckets → tf/df → smooth idf → L2 norm → hub-pruned
  * pair sums). */
object TfIdfQueries {

  private val Dim = 4096
  // the synthetic corpus concentrates weight in shared-vocab hub
  // buckets; after hub pruning, pair sims top out ~0.42 — 0.2 keeps a
  // small but genuinely exercised pair set (27 at sf0.01)
  private val MinSim = 0.2
  private val MaxDfRatio = 0.5

  private def tfidfWeights(s: SparkSession, dir: String): DataFrame =
    TfIdf.hashedWeights(Tables.documents(s, dir), "doc_id", "text", Dim)
      .select(col("doc_id"), col("bucket"),
        round(col("weight"), 4).as("weight"))
      .orderBy("doc_id", "bucket")

  private def tfidfSim(s: SparkSession, dir: String): DataFrame = {
    val w = TfIdf.hashedWeights(Tables.documents(s, dir), "doc_id", "text", Dim)
    TfIdf.similarityJoin(w, "doc_id", MinSim, MaxDfRatio)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
      .orderBy("id_a", "id_b")
  }

  private def polySql(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, len($e)+1), j -> ascii(($e)[CAST(j AS INT)]))),
       |  (a, b) -> (a * 31 + b) % 2147483647)""".stripMargin

  private val weightsCte: String =
    s"""WITH toks AS (
       |  SELECT doc_id, u.t AS tok
       |  FROM documents,
       |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS u(t)
       |  WHERE text IS NOT NULL
       |),
       |bk AS (SELECT doc_id, CAST(${polySql("tok")} % $Dim AS INT) AS bucket FROM toks),
       |tf AS (SELECT doc_id, bucket, count(*) AS tf FROM bk GROUP BY doc_id, bucket),
       |nn AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
       |dfx AS (SELECT bucket, count(*) AS df FROM tf GROUP BY bucket),
       |w AS (
       |  SELECT doc_id, bucket, df,
       |    tf * (ln((nn.n + 1.0) / (df + 1.0)) + 1.0) AS w
       |  FROM tf JOIN dfx USING (bucket) CROSS JOIN nn
       |),
       |nw AS (
       |  SELECT doc_id, bucket, df,
       |    w / sqrt(sum(w * w) OVER (PARTITION BY doc_id)) AS weight
       |  FROM w
       |)""".stripMargin

  private val weightsOracle: String =
    s"""$weightsCte
       |SELECT doc_id, bucket, round(weight, 4) AS weight
       |FROM nw ORDER BY doc_id, bucket""".stripMargin

  private val simOracle: String =
    s"""$weightsCte
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  round(sum(a.weight * b.weight), 4) AS sim
       |FROM nw a JOIN nw b
       |  ON a.bucket = b.bucket AND a.doc_id < b.doc_id
       |CROSS JOIN nn
       |WHERE a.df <= $MaxDfRatio * nn.n
       |GROUP BY a.doc_id, b.doc_id
       |HAVING sum(a.weight * b.weight) >= $MinSim
       |ORDER BY id_a, id_b""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef("tfidf_weights", Some(weightsOracle), tfidfWeights),
    QueryDef("tfidf_sim", Some(simOracle), tfidfSim),
  )
}
