package graft.embed

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed embedding generation — the `create-embeddings` job
  * (lantern_cli/src/embeddings/mod.rs: producer :132-171, embedding
  * worker :173-265, db exporter :390-570) collapsed into one Spark
  * pipeline: `mapPartitions` batches rows per the model's batch size,
  * calls the runtime once per batch, and emits the embedding column
  * plus an error column. Failed rows are a side output
  * (`failedRows`), not a job failure — mirroring the reference's
  * failed-rows table.
  *
  * Scale shape: pure map-side (no shuffle); batching bounds runtime
  * call overhead; the runtime rides the closure so each executor
  * initializes it once. Daemon-style incremental re-embedding is this
  * same function inside `foreachBatch` (graft.streaming).
  */
object EmbeddingPipeline {

  val EmbeddingCol = "embedding_out"
  val ErrorCol = "embed_error"
  val CompletionCol = "completion_out"

  /** Append `embedding_out` (array<float>, null on failure) and
    * `embed_error` (string, null on success) to `df`.
    */
  def createEmbeddings(
      df: DataFrame,
      textCol: String,
      runtime: EmbeddingRuntime,
      model: String,
      batchSizeOverride: Int = 0): DataFrame = {
    val info = runtime.modelInfo(model)
    val batchSize = if (batchSizeOverride > 0) batchSizeOverride else info.batchSize
    val schema = df.schema
      .add(EmbeddingCol, ArrayType(FloatType))
      .add(ErrorCol, StringType)
    val textIdx = df.schema.fieldIndex(textCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val inputs = batch.map { r =>
          if (r.isNullAt(textIdx)) null else r.getString(textIdx)
        }
        val results = runtime.embedBatch(model, inputs)
        batch.lazyZip(results).map {
          case (r, Right(vec)) => Row.fromSeq(r.toSeq :+ vec.toSeq :+ null)
          case (r, Left(err)) => Row.fromSeq(r.toSeq :+ null :+ err)
        }
      }
    }(enc)
  }

  /** Batch LLM completion with failed-row capture — the completion-job
    * pipeline (`add_completion_job`, lantern_extras/src/daemon.rs:175
    * + daemon/embedding_jobs.rs's completion job_type): one completion
    * per row through the runtime, appending `completion_out` (null on
    * failure) and `embed_error` (null on success). Same side-output
    * contract as [[createEmbeddings]] — a bad row never fails the job.
    * Map-side; per-row calls because completion APIs take one prompt
    * per request (the reference does the same).
    */
  def createCompletions(
      df: DataFrame,
      promptCol: String,
      runtime: EmbeddingRuntime,
      model: String,
      systemPrompt: String = ""): DataFrame = {
    val schema = df.schema
      .add(CompletionCol, StringType)
      .add(ErrorCol, StringType)
    val promptIdx = df.schema.fieldIndex(promptCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = if (r.isNullAt(promptIdx)) null else r.getString(promptIdx)
        if (p == null || p.isEmpty)
          Row.fromSeq(r.toSeq :+ null :+ "empty input")
        else try
          Row.fromSeq(r.toSeq :+ runtime.complete(model, systemPrompt, p) :+ null)
        catch {
          // never a null error message: error=null MEANS success, and a
          // bare NPE would otherwise smuggle its row into completedRows
          case e: Exception => Row.fromSeq(r.toSeq :+ null :+
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
        }
      }
    }(enc)
  }

  /** Rows whose completion succeeded, error column dropped — the same
    * error-column contract as [[embeddedRows]], so it IS that filter. */
  def completedRows(df: DataFrame): DataFrame = embeddedRows(df)

  /** `image_embedding` over a binary media column — the reference
    * dispatches text and image inputs through the same embedding entry
    * (lantern_extras/src/embeddings.rs:154-199, clip ViT-B-32 visual in
    * the model map). Decode (graft.multimodal, fixture-stubbed per its
    * doc) → optional resize → pixel float tensor → the runtime's visual
    * session, batched map-side like [[createEmbeddings]]; decode OR
    * embed failures land in `embed_error`, never fail the job.
    */
  def createImageEmbeddings(
      df: DataFrame,
      binCol: String,
      runtime: OrtEmbeddingRuntime,
      model: String,
      resizeTo: Option[(Int, Int)] = None,
      batchSizeOverride: Int = 0): DataFrame = {
    import graft.multimodal.Multimodal
    val meta = OrtModels.byName(model).getOrElse(
      throw new IllegalArgumentException(s"graft: unknown ort model '$model'"))
    require(meta.visual, s"graft: '$model' is not an image encoder")
    val batchSize = if (batchSizeOverride > 0) batchSizeOverride else meta.batchSize
    val schema = df.schema
      .add(EmbeddingCol, ArrayType(FloatType))
      .add(ErrorCol, StringType)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // decode locally first so a bad payload is a per-row error and
        // the session only ever sees well-formed pixel tensors
        val decoded: Seq[Either[String, Array[Float]]] = batch.map { r =>
          try {
            val img0 = Multimodal.decodeImage(r.getAs[Array[Byte]](binIdx))
            val img = resizeTo.fold(img0) { case (w, h) =>
              Multimodal.resizeNearest(img0, w, h)
            }
            Right(img.pixels.map(b => (b & 0xFF).toFloat))
          } catch {
            case e: Exception => Left(s"decode: ${e.getMessage}")
          }
        }
        val good = decoded.collect { case Right(px) => px }
        val embedded = runtime.embedImageBatch(model, good)
        val it = embedded.iterator
        batch.lazyZip(decoded).map {
          case (r, Left(err)) => Row.fromSeq(r.toSeq :+ null :+ err)
          case (r, Right(_)) => it.next() match {
            case Right(vec) => Row.fromSeq(r.toSeq :+ vec.toSeq :+ null)
            case Left(err) => Row.fromSeq(r.toSeq :+ null :+ err)
          }
        }
      }
    }(enc)
  }

  /** The failed-row side output (reference failed-rows table). */
  def failedRows(embedded: DataFrame): DataFrame =
    embedded.where(col(ErrorCol).isNotNull)

  /** Successfully embedded rows with the error column dropped. */
  def embeddedRows(embedded: DataFrame): DataFrame =
    embedded.where(col(ErrorCol).isNull).drop(ErrorCol)

  /** `text_embedding` as a single-value convenience
    * (lantern_extras/src/embeddings.rs:154-199).
    */
  def textEmbedding(runtime: EmbeddingRuntime, model: String, text: String): Array[Float] =
    runtime.embedBatch(model, Seq(text)).head match {
      case Right(v) => v
      case Left(err) => throw new IllegalArgumentException(s"graft: embedding failed: $err")
    }

  /** `llm_completion` as a column over a prompt column. */
  def llmCompletion(
      df: DataFrame,
      promptCol: String,
      runtime: EmbeddingRuntime,
      model: String,
      systemPrompt: String = ""): DataFrame = {
    val f = udf { p: String => runtime.complete(model, systemPrompt, p) }
    df.withColumn("completion", f(col(promptCol)))
  }
}
