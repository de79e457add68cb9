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

  /** Binary media column → decode → visual-encoder embedding — the
    * `image_embedding` path (lantern_extras/src/embeddings.rs:154-199)
    * over the deterministic visual session: the embedding is a pure
    * function of the pixel-sum hash h = Σ pixel_i·(i+1) mod 100003, so
    * the DuckDB oracle recomputes selected components exactly. Docs
    * with doc_id % 83 = 7 carry a corrupt payload to exercise the
    * failed-row side output.
    */
  private def imageEmbedding(s: SparkSession, dir: String): DataFrame = {
    import graft.embed.{EmbeddingPipeline, HashVisualSessionFactory, OrtEmbeddingRuntime}
    val mediaUdf = udf { id: Long =>
      if (id % 83 == 7) Array[Byte](1, 2, 3, 4)
      else Multimodal.syntheticImageBytes(id, (4 + id % 5).toInt, (3 + id % 4).toInt)
    }
    val docs = Tables.documents(s, dir).select(col("doc_id"))
      .withColumn("media", mediaUdf(col("doc_id")))
    val rt = new OrtEmbeddingRuntime(HashVisualSessionFactory)
    EmbeddingPipeline.createImageEmbeddings(docs, "media", rt, "clip/ViT-B-32-visual")
      .select(
        col("doc_id"),
        // failed rows carry no embedding; sentinel -9.0 (outside the
        // [-0.5, 0.5) range) keeps the compare NULL-free (NaN≠NaN in
        // the driver's pandas-side hash)
        coalesce(element_at(col(EmbeddingPipeline.EmbeddingCol), 1).cast("double"), lit(-9.0)).as("e0"),
        coalesce(element_at(col(EmbeddingPipeline.EmbeddingCol), 2).cast("double"), lit(-9.0)).as("e1"),
        coalesce(element_at(col(EmbeddingPipeline.EmbeddingCol), 512).cast("double"), lit(-9.0)).as("e511"),
        col(EmbeddingPipeline.ErrorCol).isNotNull.cast("int").as("failed"))
      .orderBy("doc_id")
  }

  private val imageEmbeddingOracle: String = {
    // h = Σ pixel_i·(i+1) mod 100003 over pixel_i = (doc_id·7+i·13)%256;
    // e[j] = (((h+j)·2654435761) % 100003 % 1024)/1024 − 0.5 — exact
    // binary fractions, all intermediates < 2^53 (same contract as the
    // embed_pipeline oracle)
    def e(j: Int) =
      s"((((h + $j) * 2654435761) % 100003) % 1024) / 1024.0 - 0.5"
    """WITH px AS (
      |  SELECT doc_id,
      |    list_sum(list_transform(range(0, (4 + doc_id % 5) * (3 + doc_id % 4)),
      |      i -> ((doc_id * 7 + i * 13) % 256) * (i + 1))) % 100003 AS h
      |  FROM documents)
      |SELECT doc_id,
      |""".stripMargin +
      s"""  CASE WHEN doc_id % 83 = 7 THEN -9.0 ELSE ${e(0)} END AS e0,
         |  CASE WHEN doc_id % 83 = 7 THEN -9.0 ELSE ${e(1)} END AS e1,
         |  CASE WHEN doc_id % 83 = 7 THEN -9.0 ELSE ${e(511)} END AS e511,
         |  CAST(doc_id % 83 = 7 AS INT) AS failed
         |FROM px ORDER BY doc_id""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("multimodal_features", Some(oracle), features),
    QueryDef("image_embedding", Some(imageEmbeddingOracle), imageEmbedding),
  )
}
