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

  /** REAL audio decode end-to-end: per-doc synthetic PCM16 WAV bytes
    * (a genuine RIFF container written by AudioSystem) decode through
    * `javax.sound.sampled`, then clip features. Sample i is the int16
    * `(doc_id·31 + i·7919) mod 65536 − 32768`, so the oracle
    * regenerates the float samples exactly (int16/32768 is dyadic).
    * Docs with doc_id % 89 = 11 carry corrupt bytes → failed-row side
    * channel, -1 sentinels. */
  private def audioFeaturesQ(s: SparkSession, dir: String): DataFrame = {
    val mediaUdf = udf { id: Long =>
      if (id % 89 == 11) Array[Byte](9, 9, 9)
      else Multimodal.syntheticWavBytes(id, (50 + id % 64).toInt, 8000)
    }
    def r4(c: org.apache.spark.sql.Column) = floor(c * 1e4 + 0.5) / 1e4
    val docs = Tables.documents(s, dir).select(col("doc_id"))
      .withColumn("media", mediaUdf(col("doc_id")))
    Multimodal.audioPipeline(docs, "media")
      .select(
        col("doc_id"),
        coalesce(col("sample_rate"), lit(-1)).as("sample_rate"),
        coalesce(col("n_samples"), lit(-1)).as("n_samples"),
        coalesce(r4(element_at(col("afeatures"), 2)), lit(-1.0)).as("peak"),
        coalesce(r4(element_at(col("afeatures"), 3)), lit(-1.0)).as("rms"),
        coalesce(r4(element_at(col("afeatures"), 4)), lit(-1.0)).as("zcr"),
        col("media_error").isNotNull.cast("int").as("failed"))
      .orderBy("doc_id")
  }

  private val audioOracle: String =
    """WITH base AS (
      |  SELECT doc_id, CAST(50 + doc_id % 64 AS INT) AS n FROM documents
      |), s AS (
      |  SELECT doc_id, n,
      |    list_transform(range(0, n),
      |      i -> ((doc_id * 31 + i * 7919) % 65536 - 32768) / 32768.0) AS v
      |  FROM base WHERE doc_id % 89 <> 11
      |), f AS (
      |  SELECT doc_id, n,
      |    list_max(list_transform(v, x -> abs(x))) AS peak,
      |    sqrt(list_sum(list_transform(v, x -> x * x)) / n) AS rms,
      |    CASE WHEN n <= 1 THEN 0.0 ELSE
      |      len(list_filter(range(1, n), i ->
      |        (v[i] < 0) <> (v[i+1] < 0) AND v[i] <> 0 AND v[i+1] <> 0))
      |        * 1.0 / (n - 1) END AS zcr
      |  FROM s
      |)
      |SELECT doc_id, CAST(8000 AS INT) AS sample_rate, n AS n_samples,
      |  floor(peak * 1e4 + 0.5) / 1e4 AS peak,
      |  floor(rms * 1e4 + 0.5) / 1e4 AS rms,
      |  floor(zcr * 1e4 + 0.5) / 1e4 AS zcr,
      |  CAST(0 AS INT) AS failed
      |FROM f
      |UNION ALL
      |SELECT doc_id, -1, -1, -1.0, -1.0, -1.0, CAST(1 AS INT)
      |FROM base WHERE doc_id % 89 = 11
      |ORDER BY doc_id""".stripMargin

  /** Video pipeline gate: per-doc GVID clips of FIXTURE frames stream
    * through decode → every-2nd-frame sampling → pixel statistics,
    * hash-matched against the exact DuckDB replay of the pixel
    * formula. Before emitting anything, the gate decodes a clip of
    * GENUINE ImageIO-written JPEG frames through the same video path
    * and requires frame-for-frame pixel equality with the single-image
    * decode of those very JPEG bytes — JPEG is lossy, so the oracle
    * can't replay its pixels, but the video path must agree with the
    * image path exactly (the MJPEG contract). Any mismatch empties the
    * output → rows_match fails. */
  private def videoFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val jpegOk = {
      val (w, h, nf) = (8, 6, 3)
      val clip = Multimodal.jpegVideoBytes(7L, w, h, nf)
      val viaVideo = Multimodal.decodeVideo(clip)
      // unpack the same frame payloads and decode them as single images
      val bb = java.nio.ByteBuffer.wrap(clip)
      bb.getInt(); val n = bb.getInt()
      val viaImage = (0 until n).map { _ =>
        val b = new Array[Byte](bb.getInt()); bb.get(b)
        Multimodal.decodeImage(b)
      }
      viaVideo.size == nf && viaVideo.zip(viaImage).forall { case (a, b) =>
        a.width == w && a.height == h && a.pixels.sameElements(b.pixels)
      }
    }
    val mediaUdf = udf { id: Long =>
      Multimodal.syntheticVideoBytes(
        id, (4 + id % 5).toInt, (3 + id % 4).toInt, (2 + id % 3).toInt)
    }
    val docs = Tables.documents(s, dir).select(col("doc_id"))
      .withColumn("media", mediaUdf(col("doc_id")))
    val out = Multimodal.videoPipeline(docs, "media", everyN = 2)
      .select(col("doc_id"), col("n_frames"), col("n_sampled"),
        col("pmin"), col("pmax"), col("psum"))
      .orderBy("doc_id")
    if (jpegOk) out else out.limit(0)
  }

  private val videoOracle: String =
    """WITH v AS (
      |  SELECT doc_id, (4 + doc_id % 5) AS w, (3 + doc_id % 4) AS h,
      |         (2 + doc_id % 3) AS nf
      |  FROM documents
      |), fr AS (
      |  SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS f FROM v
      |), px AS (
      |  SELECT doc_id, nf,
      |    list_transform(range(0, w * h),
      |      i -> ((doc_id + f) * 7 + i * 13) % 256) AS p
      |  FROM fr WHERE f % 2 = 0
      |)
      |SELECT doc_id,
      |  CAST(max(nf) AS INT) AS n_frames,
      |  CAST(count(*) AS INT) AS n_sampled,
      |  CAST(min(list_aggregate(p, 'min')) AS INT) AS pmin,
      |  CAST(max(list_aggregate(p, 'max')) AS INT) AS pmax,
      |  CAST(sum(list_sum(p)) AS BIGINT) AS psum
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("multimodal_features", Some(oracle), features),
    QueryDef("image_embedding", Some(imageEmbeddingOracle), imageEmbedding),
    QueryDef("audio_features", Some(audioOracle), audioFeaturesQ),
    QueryDef("video_features", Some(videoOracle), videoFeatures),
  )
}
