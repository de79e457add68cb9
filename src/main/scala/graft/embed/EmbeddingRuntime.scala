package graft.embed

/** Model metadata: name, output dim, the per-model default batch size
  * (the reference keys batching on the model —
  * lantern_cli/src/embeddings/mod.rs:574-608), and the model's token
  * sequence limit (`sequence_len`, openai_runtime.rs:83-97; 0 = no
  * limit — inputs are neither truncated nor token-grouped).
  *
  * `requestTokens` is the per-REQUEST total token budget used when
  * packing truncated inputs into HTTP requests. The reference reuses
  * `sequence_len` for both roles (chunk_inputs passes it to
  * group_vectors_by_token_count, openai_runtime.rs:336-355), which
  * means two near-limit inputs can never share a request; APIs
  * actually accept far larger totals (OpenAI's embeddings endpoint
  * takes 300k tokens summed per request), so a distinct budget cuts
  * request count for long-document batches. 0 = reference-parity
  * (fall back to `seqLen`).
  */
case class ModelInfo(name: String, dim: Int, batchSize: Int, seqLen: Int = 0,
    requestTokens: Int = 0) {
  /** The packing budget [[graft.embed.TokenChunker.group]] should use. */
  def requestBudget: Int = if (requestTokens > 0) requestTokens else seqLen
}

/** Pluggable embedding backend — the `EmbeddingRuntimeT` trait of the
  * reference (lantern_cli/src/embeddings/core/runtime.rs:18-28), which
  * ships Ort (local ONNX), OpenAI and Cohere implementations. Real
  * network/ONNX runtimes cannot exist in this zero-egress build, so
  * the shipped implementation is [[HashEmbeddingRuntime]] — fully
  * deterministic and therefore driver-verifiable; API-backed runtimes
  * plug in behind the same trait.
  */
trait EmbeddingRuntime extends Serializable {
  def name: String
  def models: Seq[ModelInfo]

  /** Embed one batch. Per-input result: Right(vector) or Left(error) —
    * errors become the failed-row side output, never a job failure
    * (reference db_exporter failed-rows table, embeddings/mod.rs:390-570).
    */
  def embedBatch(model: String, inputs: Seq[String]): Seq[Either[String, Array[Float]]]

  /** Chat completion as a scalar — `llm_completion`
    * (lantern_extras/src/embeddings.rs:129-152).
    */
  def complete(model: String, systemPrompt: String, userPrompt: String): String

  def modelInfo(model: String): ModelInfo =
    models.find(_.name == model).getOrElse(throw new IllegalArgumentException(
      s"graft: unknown model '$model' for runtime '$name' " +
        s"(available: ${models.map(_.name).mkString(", ")})"))
}

/** Deterministic mock runtime. The embedding of a text is a pure
  * function of its code points, chosen to be expressible in ANSI SQL so
  * the driver's DuckDB oracle can recompute it exactly:
  *
  *   h    = Σ_{i=1..n} codepoint(c_i) · i   mod 100003
  *   e[j] = ((((h + j) · 2654435761) mod 100003) mod 1024) / 1024 − 0.5
  *
  * The double mod gives per-dimension mixing (distinct texts virtually
  * never collide on all dims), and /1024 makes every component an exact
  * binary fraction — bit-identical between float, double, Spark and
  * DuckDB, with no rounding step needed. All intermediate integers stay
  * below 2^53, so SQL BIGINT arithmetic is exact.
  *
  * Inputs that are null/empty or longer than `maxChars` fail (→ the
  * failed-row side output), standing in for the reference's tokenizer
  * length limits.
  */
class HashEmbeddingRuntime(maxChars: Int = 100000) extends EmbeddingRuntime {
  override def name: String = "hash-mock"

  override def models: Seq[ModelInfo] = Seq(
    ModelInfo("mock/tiny", 8, 2000),
    ModelInfo("mock/base", 64, 500),
    ModelInfo("mock/large", 256, 100))

  override def embedBatch(
      model: String, inputs: Seq[String]): Seq[Either[String, Array[Float]]] = {
    val dim = modelInfo(model).dim
    inputs.map { t =>
      if (t == null || t.isEmpty) Left("empty input")
      else if (t.length > maxChars) Left(s"input longer than $maxChars chars")
      else Right(HashEmbeddingRuntime.embed(t, dim))
    }
  }

  override def complete(model: String, systemPrompt: String, userPrompt: String): String =
    s"[$name/$model] ${userPrompt.take(80)}"
}

object HashEmbeddingRuntime {
  val Mod = 100003L
  val Mix = 2654435761L

  /** Code-point position-weighted hash (1-based positions, matching
    * SQL `list_transform(range(1, length(t)+1), ...)`).
    */
  def textHash(t: String): Long = {
    var h = 0L
    var i = 0
    var pos = 1L
    while (i < t.length) {
      val cp = t.codePointAt(i)
      h += cp.toLong * pos
      pos += 1
      i += Character.charCount(cp)
    }
    ((h % Mod) + Mod) % Mod
  }

  def embed(t: String, dim: Int): Array[Float] =
    embedFromHash(textHash(t), dim)

  /** The formula from any precomputed content hash — shared with the
    * deterministic VISUAL session (pixel-sum hash, see
    * [[HashVisualSessionFactory]]). */
  def embedFromHash(h: Long, dim: Int): Array[Float] =
    Array.tabulate(dim)(j =>
      (((((h + j) * Mix) % Mod) % 1024L) / 1024.0 - 0.5).toFloat)

  /** The same function as DuckDB SQL over column `c` (for oracles). */
  def hashSql(c: String): String =
    s"(coalesce(list_sum(list_transform(range(1, length($c) + 1), i -> unicode($c[i:i]) * i)), 0) % $Mod)"

  def embedSql(c: String, j: Int): String =
    s"((((${hashSql(c)} + $j) * $Mix) % $Mod) % 1024) / 1024.0 - 0.5"
}

/** Runtime registry — `get_available_models` / `get_available_runtimes`
  * (lantern_extras/src/embeddings.rs:201-235).
  */
object EmbeddingRuntimes {
  private val registry = scala.collection.concurrent.TrieMap[String, EmbeddingRuntime](
    "hash-mock" -> new HashEmbeddingRuntime(),
    "openai" -> new OpenAiEmbeddingRuntime(),
    "cohere" -> new CohereEmbeddingRuntime(),
    "ort" -> new OrtEmbeddingRuntime())

  def register(rt: EmbeddingRuntime): Unit = registry.put(rt.name, rt)
  def get(name: String): EmbeddingRuntime =
    registry.getOrElse(name, throw new IllegalArgumentException(
      s"graft: unknown runtime '$name' (available: ${availableRuntimes.mkString(", ")})"))
  def availableRuntimes: Seq[String] = registry.keys.toSeq.sorted
  def availableModels: Seq[(String, ModelInfo)] =
    registry.values.flatMap(rt => rt.models.map(rt.name -> _)).toSeq
      .sortBy(x => (x._1, x._2.name))
}
