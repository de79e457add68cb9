package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.WeightedSearch

/** Driver-checkable query for composite weighted search (SURVEY.md
  * §2.4). The second vector column is derived (reversed embedding) so
  * the multi-column shape is exercised on the single-vector test table;
  * the oracle derives it identically with list_reverse.
  */
object WeightedQueries {

  private def weightedKnn(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val q2 = q.reverse
    val df = e.where(col("vec_id") =!= 0)
      .withColumn("emb2", reverse(col("embedding")))
    WeightedSearch
      .exact(df,
        Seq(
          WeightedSearch.Term(0.7, "embedding", q),
          WeightedSearch.Term(0.3, "emb2", q2)),
        k = 10,
        tieBreak = Seq(col("vec_id")))
      .select(col("vec_id"), round(col("joint_dist"), 4).as("dist"))
  }

  private val oracle: String = {
    def l2sq(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))^2))"
    val joint =
      s"0.7 * ${l2sq("e.embedding", "qr.q")} + 0.3 * ${l2sq("list_reverse(e.embedding)", "list_reverse(qr.q)")}"
    s"""SELECT e.vec_id, round($joint, 4) AS dist
       |FROM embeddings e, (SELECT embedding AS q FROM embeddings WHERE vec_id = 0) qr
       |WHERE e.vec_id <> 0
       |ORDER BY $joint, e.vec_id
       |LIMIT 10""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("weighted_knn_exact", Some(oracle), weightedKnn),
  )
}
