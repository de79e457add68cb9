package graft.embed

/** Model throughput micro-bench — `measure-model-speed`
  * (lantern_cli/src/embeddings/measure_speed.rs): run timed batches
  * through a runtime and report tokens/sec (whitespace tokens, like
  * the reference's rough count).
  */
object MeasureSpeed {

  case class Speed(model: String, tokensPerSec: Double, itemsPerSec: Double,
      totalTokens: Long, seconds: Double)

  def measure(
      runtime: EmbeddingRuntime,
      model: String,
      texts: Seq[String],
      warmupBatches: Int = 1): Speed = {
    require(texts.nonEmpty, "graft: need at least one text to measure")
    val info = runtime.modelInfo(model)
    val batches = texts.grouped(info.batchSize).toSeq
    batches.take(warmupBatches).foreach(b => runtime.embedBatch(model, b))
    val t0 = System.nanoTime()
    batches.foreach(b => runtime.embedBatch(model, b))
    val secs = (System.nanoTime() - t0) / 1e9
    val tokens = texts.map(t =>
      if (t == null || t.isEmpty) 0L else t.split("\\s+").length.toLong).sum
    Speed(model, tokens / secs, texts.size / secs, tokens, secs)
  }
}
