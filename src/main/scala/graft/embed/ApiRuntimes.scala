package graft.embed

/** HTTP transport seam for API-backed runtimes: (url, jsonBody) →
  * jsonResponse. Injectable so the request/response wiring is testable
  * in this zero-egress environment; production plugs in a real client.
  */
trait HttpTransport extends Serializable {
  def post(url: String, body: String, headers: Map[String, String]): String
}

/** Token-budget chunking for API embedding requests — the analog of
  * the reference's `chunk_inputs` + `group_vectors_by_token_count`
  * (openai_runtime.rs:314-400). Token counts use the library's GPT-2
  * style pre-tokenizer ([[graft.functions.BpePretokenizePattern]]):
  * tiktoken's cl100k merges are unavailable offline, and pre-token
  * counts LOWER-bound BPE counts (BPE only splits pre-tokens further),
  * so truncation is slightly laxer than the reference's — documented
  * deviation, same shape.
  */
private[embed] object TokenChunker {
  private val P =
    java.util.regex.Pattern.compile(graft.functions.BpePretokenizePattern)

  /** Text cut at the `maxTokens`-th pre-token boundary (a prefix of
    * the original — the pattern's matches tile the whole string),
    * plus its token count. `maxTokens <= 0` = no limit. */
  def truncate(text: String, maxTokens: Int): (String, Int) = {
    val m = P.matcher(text)
    var n = 0
    var end = 0
    var more = false
    while ({ more = m.find(); more && (maxTokens <= 0 || n < maxTokens) }) {
      n += 1
      end = m.end()
    }
    if (more) (text.substring(0, end), n) else (text, n)
  }

  /** Greedy packing of (text, idx, tokens) into groups whose total
    * token count stays within `budget` (each item alone is within it
    * after [[truncate]]); `budget <= 0` = single group. */
  def group(
      items: Seq[(String, Int, Int)],
      budget: Int): Seq[Seq[(String, Int, Int)]] = {
    if (items.isEmpty) return Nil
    if (budget <= 0) return Seq(items)
    val out = scala.collection.mutable.ArrayBuffer[Seq[(String, Int, Int)]]()
    var cur = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
    var used = 0
    items.foreach { it =>
      if (cur.nonEmpty && used + it._3 > budget) {
        out += cur.toSeq
        cur = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
        used = 0
      }
      cur += it
      used += it._3
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq
  }
}

object NoEgressTransport extends HttpTransport {
  override def post(url: String, body: String, headers: Map[String, String]): String =
    throw new IllegalStateException(
      s"graft: no network egress in this environment (attempted POST $url); " +
        "inject an HttpTransport with real connectivity")
}

/** OpenAI-compatible embedding runtime — `openai_embedding` and the
  * OpenAI runtime of the reference (lantern_cli/src/embeddings/core/
  * openai_runtime.rs: models + dims :79-101; request shape is the
  * public /v1/embeddings API). Only the transport is external; request
  * building, batching and response parsing live here and are tested
  * with a fake transport.
  */
class OpenAiEmbeddingRuntime(
    apiKey: String = sys.env.getOrElse("OPENAI_API_KEY", ""),
    baseUrl: String = "https://api.openai.com/v1",
    transport: HttpTransport = NoEgressTransport) extends EmbeddingRuntime {

  override def name: String = "openai"

  /** Models/dims/sequence_len per openai_runtime.rs:79-101; batch 500
    * per embeddings/mod.rs:574-608. `requestTokens` is the endpoint's
    * published 300k-total-per-request cap — the reference packs
    * requests to sequence_len instead, splitting ordinary long-doc
    * batches into one HTTP round-trip per input. */
  override def models: Seq[ModelInfo] = Seq(
    ModelInfo("text-embedding-ada-002", 1536, 500, seqLen = 8190,
      requestTokens = 300000),
    ModelInfo("text-embedding-3-small", 1536, 500, seqLen = 8190,
      requestTokens = 300000),
    ModelInfo("text-embedding-3-large", 3072, 500, seqLen = 8190,
      requestTokens = 300000))

  override def embedBatch(
      model: String, inputs: Seq[String]): Seq[Either[String, Array[Float]]] = {
    val info = modelInfo(model)
    // null/empty inputs fail up front (same contract as the mock
    // runtime — they must reach the failed-row side output, not the API)
    val good = inputs.zipWithIndex.filter { case (t, _) => t != null && t.nonEmpty }
    val results = scala.collection.mutable.ArrayBuffer
      .fill[Either[String, Array[Float]]](inputs.size)(Left("empty input"))
    // the reference's chunk_inputs (openai_runtime.rs:314-371):
    // truncate each input to sequence_len tokens, then pack inputs
    // into requests whose TOTAL token count stays within the
    // per-request budget — one oversized request would otherwise fail
    // the whole batch. A request that does fail only fails ITS inputs,
    // not the batch. Truncation uses seqLen (per-input limit); packing
    // uses the distinct requestBudget (ModelInfo.requestTokens).
    val prepared = good.map { case (t, idx) =>
      val (text, n) = TokenChunker.truncate(t, info.seqLen)
      (text, idx, n)
    }
    TokenChunker.group(prepared, info.requestBudget).foreach { grp =>
      val body = ApiJson.obj(
        "model" -> ApiJson.str(model),
        "input" -> ApiJson.arr(grp.map { case (t, _, _) => ApiJson.str(t) }))
      try {
        val resp = transport.post(s"$baseUrl/embeddings", body,
          Map("Authorization" -> s"Bearer $apiKey",
            "Content-Type" -> "application/json"))
        val vecs = ApiJson.extractFloatArrays(resp, "embedding")
        require(vecs.size == grp.size,
          s"graft: expected ${grp.size} embeddings, got ${vecs.size}")
        grp.zip(vecs).foreach { case ((_, idx, _), v) =>
          results(idx) =
            if (v.length == info.dim) Right(v)
            else Left(s"bad dim ${v.length} != ${info.dim}")
        }
      } catch {
        case e: Exception =>
          grp.foreach { case (_, idx, _) => results(idx) = Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}") }
      }
    }
    results.toSeq
  }

  override def complete(model: String, systemPrompt: String, userPrompt: String): String = {
    val body = ApiJson.obj(
      "model" -> ApiJson.str(model),
      "messages" -> ApiJson.arr(Seq(
        ApiJson.obj("role" -> ApiJson.str("system"), "content" -> ApiJson.str(systemPrompt)),
        ApiJson.obj("role" -> ApiJson.str("user"), "content" -> ApiJson.str(userPrompt)))))
    val resp = transport.post(s"$baseUrl/chat/completions", body,
      Map("Authorization" -> s"Bearer $apiKey", "Content-Type" -> "application/json"))
    ApiJson.extractString(resp, "content").getOrElse(
      throw new IllegalStateException("graft: no content in completion response"))
  }
}

/** Cohere embedding runtime (cohere_runtime.rs; batch size per
  * embeddings/mod.rs:574-608).
  */
class CohereEmbeddingRuntime(
    apiKey: String = sys.env.getOrElse("COHERE_API_KEY", ""),
    baseUrl: String = "https://api.cohere.ai/v1",
    transport: HttpTransport = NoEgressTransport) extends EmbeddingRuntime {

  override def name: String = "cohere"

  override def models: Seq[ModelInfo] = Seq(
    ModelInfo("embed-english-v3.0", 1024, 5000),
    ModelInfo("embed-multilingual-v3.0", 1024, 5000))

  override def embedBatch(
      model: String, inputs: Seq[String]): Seq[Either[String, Array[Float]]] = {
    val info = modelInfo(model)
    val good = inputs.zipWithIndex.filter { case (t, _) => t != null && t.nonEmpty }
    val results = scala.collection.mutable.ArrayBuffer
      .fill[Either[String, Array[Float]]](inputs.size)(Left("empty input"))
    if (good.nonEmpty) {
      val body = ApiJson.obj(
        "model" -> ApiJson.str(model),
        "input_type" -> ApiJson.str("search_document"),
        "texts" -> ApiJson.arr(good.map { case (t, _) => ApiJson.str(t) }))
      try {
        val resp = transport.post(s"$baseUrl/embed", body,
          Map("Authorization" -> s"Bearer $apiKey",
            "Content-Type" -> "application/json"))
        val vecs = ApiJson.extractTopLevelFloatArrays(resp, "embeddings")
        require(vecs.size == good.size,
          s"graft: expected ${good.size} embeddings, got ${vecs.size}")
        good.zip(vecs).foreach { case ((_, idx), v) =>
          results(idx) =
            if (v.length == info.dim) Right(v)
            else Left(s"bad dim ${v.length} != ${info.dim}")
        }
      } catch {
        case e: Exception =>
          good.foreach { case (_, idx) => results(idx) = Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}") }
      }
    }
    results.toSeq
  }

  override def complete(model: String, systemPrompt: String, userPrompt: String): String =
    throw new UnsupportedOperationException("graft: cohere runtime is embeddings-only")
}

/** Minimal JSON build/extract helpers (no extra deps in this build;
  * responses from the targeted APIs are flat enough for structural
  * extraction — swap for a real parser if the surface grows).
  */
private[embed] object ApiJson {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  def arr(items: Seq[String]): String = items.mkString("[", ",", "]")
  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${str(k)}:$v" }.mkString("{", ",", "}")

  /** All `"key":[floats]` arrays, in order (OpenAI data[i].embedding). */
  def extractFloatArrays(json: String, key: String): Seq[Array[Float]] =
    (s""""$key"\\s*:\\s*\\[([^\\]]*)\\]""".r).findAllMatchIn(json)
      .map(m => m.group(1).split(',').filter(_.trim.nonEmpty).map(_.trim.toFloat))
      .toSeq

  /** `"key":[[...],[...]]` nested arrays (Cohere embeddings). */
  def extractTopLevelFloatArrays(json: String, key: String): Seq[Array[Float]] = {
    val start = json.indexOf(s""""$key"""")
    if (start < 0) return Nil
    val open = json.indexOf('[', start)
    var depth = 0
    var i = open
    var end = -1
    while (end < 0 && i < json.length) {
      json.charAt(i) match {
        case '[' => depth += 1
        case ']' => depth -= 1; if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    if (end < 0) Nil
    else ("""\[([^\[\]]*)\]""".r).findAllMatchIn(json.substring(open + 1, end))
      .map(m => m.group(1).split(',').filter(_.trim.nonEmpty).map(_.trim.toFloat))
      .toSeq
  }

  /** First `"key":"value"` string. */
  def extractString(json: String, key: String): Option[String] =
    (s""""$key"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""".r).findFirstMatchIn(json)
      .map(_.group(1).replace("\\n", "\n").replace("\\\"", "\"").replace("\\\\", "\\"))
}
