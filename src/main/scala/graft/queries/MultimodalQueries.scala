package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Driver-checkable query for the multimodal pipeline. Media payloads
  * are synthesized deterministically per doc (the container has no
  * codecs — decode is the documented stub), so the decode → features
  * pipeline output is exactly recomputable in the DuckDB oracle from
  * the same pixel formula pixel(i) = (doc_id*7 + i*13) mod 256.
  */
object MultimodalQueries {

  private def features(s: SparkSession, dir: String): DataFrame = {
    val mediaUdf = udf { id: Long =>
      Multimodal.syntheticImageBytes(id, (4 + id % 5).toInt, (3 + id % 4).toInt)
    }
    val docs = Tables.documents(s, dir).select(col("doc_id"))
      .withColumn("media", mediaUdf(col("doc_id")))
    Multimodal.imagePipeline(docs, "media")
      .select(
        col("doc_id"),
        col("media_w").cast("long").as("media_w"),
        col("media_h").cast("long").as("media_h"),
        element_at(col("features"), 2).cast("int").as("pmin"),
        element_at(col("features"), 3).cast("int").as("pmax"),
        round(element_at(col("features"), 1).cast("double") *
          col("media_w") * col("media_h"), 0).cast("long").as("psum"))
      .orderBy("doc_id")
  }

  private val oracle: String =
    """WITH px AS (
      |  SELECT doc_id,
      |    list_transform(range(0, (4 + doc_id % 5) * (3 + doc_id % 4)),
      |      i -> (doc_id * 7 + i * 13) % 256) AS p
      |  FROM documents)
      |SELECT doc_id,
      |  (4 + doc_id % 5) AS media_w,
      |  (3 + doc_id % 4) AS media_h,
      |  CAST(list_aggregate(p, 'min') AS INT) AS pmin,
      |  CAST(list_aggregate(p, 'max') AS INT) AS pmax,
      |  CAST(list_sum(p) AS BIGINT) AS psum
      |FROM px ORDER BY doc_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("multimodal_features", Some(oracle), features),
  )
}
