package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.embed.{EmbeddingPipeline, HashEmbeddingRuntime}

/** Driver-checkable query for the embedding pipeline (SURVEY.md §2.6).
  * The deterministic hash runtime makes the whole pipeline — batching,
  * success path, failed-row side output — exactly recomputable in the
  * DuckDB oracle.
  */
object EmbedQueries {

  private def embedPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val out = EmbeddingPipeline.createEmbeddings(
      docs, "text", new HashEmbeddingRuntime(), "mock/tiny")
    // components are exact binary fractions (k/1024) — no rounding
    // needed for a bit-identical oracle compare
    out.select(
        col("doc_id"),
        element_at(col(EmbeddingPipeline.EmbeddingCol), 1).cast("double").as("e0"),
        element_at(col(EmbeddingPipeline.EmbeddingCol), 2).cast("double").as("e1"),
        element_at(col(EmbeddingPipeline.EmbeddingCol), 8).cast("double").as("e7"),
        col(EmbeddingPipeline.ErrorCol).isNotNull.cast("int").as("failed"))
      .orderBy("doc_id")
  }

  private val oracle: String = {
    def e(j: Int) =
      s"CAST(${HashEmbeddingRuntime.embedSql("text", j)} AS DOUBLE)"
    s"""SELECT doc_id,
       |CASE WHEN text IS NULL OR length(text) = 0 THEN NULL ELSE ${e(0)} END AS e0,
       |CASE WHEN text IS NULL OR length(text) = 0 THEN NULL ELSE ${e(1)} END AS e1,
       |CASE WHEN text IS NULL OR length(text) = 0 THEN NULL ELSE ${e(7)} END AS e7,
       |CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END AS failed
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("embed_pipeline", Some(oracle), embedPipeline),
  )
}
