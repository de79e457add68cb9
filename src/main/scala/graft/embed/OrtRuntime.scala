package graft.embed

/** Local ONNX (Ort) embedding runtime — the reference's primary
  * embedding path (lantern_cli/src/embeddings/core/ort_runtime.rs).
  *
  * The ONNX session itself is a SEAM ([[OrtSessionFactory]]): this
  * build has no onnxruntime artifacts (zero egress), so the session
  * layer is injectable exactly like the HTTP transport of the API
  * runtimes — production plugs `ai.onnxruntime` in behind
  * [[OrtSession]]; tests inject deterministic fakes. Everything the
  * reference implements AROUND the session lives here for real:
  *  - the model metadata map (ort_runtime.rs:284-302),
  *  - execution-provider selection with fallback (CUDA → OpenVINO →
  *    CPU, ort_runtime.rs:306-316),
  *  - memory-aware dynamic batch chunking (get_required_memory /
  *    chunk_session_input, ort_runtime.rs:330-393),
  *  - per-input failure routing into the failed-row side output.
  */

/** One loaded ONNX session: token tensors in, embeddings out.
  * `run` takes (inputIds, attentionMask) of shape [batch][seqLen] and
  * returns [batch][dim]. */
trait OrtSession extends Serializable {
  def run(inputIds: Array[Array[Long]], attentionMask: Array[Array[Long]]): Array[Array[Float]]
}

/** Session construction seam. `create` must throw if the provider is
  * unavailable — the runtime falls through the provider list. */
trait OrtSessionFactory extends Serializable {
  def create(model: String, provider: String): OrtSession
}

object NoOrtFactory extends OrtSessionFactory {
  override def create(model: String, provider: String): OrtSession =
    throw new IllegalStateException(
      s"graft: no ONNX runtime in this environment (model $model, provider " +
        s"$provider); inject an OrtSessionFactory backed by ai.onnxruntime")
}

/** Per-model metadata. `layers`/`heads`/`headDim` drive the
  * transformer memory estimate (None → no chunking needed, matching
  * the reference's `get_required_memory` returning 1);
  * `pooling` ∈ cls|mean|relu_log_max (PoolingStrategy enum);
  * `visual` marks image encoders (clip ViT visual). */
case class OrtModelMeta(
    name: String,
    dim: Int,
    batchSize: Int,
    visual: Boolean = false,
    inputImageSize: Int = 0,
    layers: Option[Int] = None,
    heads: Option[Int] = None,
    headDim: Option[Int] = None,
    pooling: String = "cls")

object OrtModels {
  /** The reference's model map (ort_runtime.rs:284-302) with the
    * public dims of each model. Entries keep the reference's exact
    * names so a lantern user's model strings resolve unchanged. */
  val all: Seq[OrtModelMeta] = Seq(
    OrtModelMeta("clip/ViT-B-32-textual", 512, 2000),
    OrtModelMeta("clip/ViT-B-32-visual", 512, 2000, visual = true, inputImageSize = 224),
    OrtModelMeta("BAAI/bge-small-en", 384, 2000),
    OrtModelMeta("BAAI/bge-base-en", 768, 2000),
    OrtModelMeta("BAAI/bge-large-en", 1024, 2000),
    OrtModelMeta("BAAI/bge-m3", 1024, 2000,
      layers = Some(8), heads = Some(4), headDim = Some(64)),
    OrtModelMeta("intfloat/e5-base-v2", 768, 2000),
    OrtModelMeta("intfloat/e5-large-v2", 1024, 2000),
    OrtModelMeta("llmrails/ember-v1", 1024, 2000),
    OrtModelMeta("thenlper/gte-base", 768, 2000),
    OrtModelMeta("thenlper/gte-large", 1024, 2000),
    OrtModelMeta("microsoft/all-MiniLM-L12-v2", 384, 2000),
    OrtModelMeta("microsoft/all-mpnet-base-v2", 768, 2000),
    OrtModelMeta("transformers/multi-qa-mpnet-base-dot-v1", 768, 2000),
    OrtModelMeta("jinaai/jina-embeddings-v2-small-en", 512, 2000,
      layers = Some(4), heads = Some(4), headDim = Some(64), pooling = "mean"),
    OrtModelMeta("jinaai/jina-embeddings-v2-base-en", 768, 2000,
      layers = Some(12), heads = Some(12), headDim = Some(64), pooling = "mean"),
    OrtModelMeta("naver/splade-v3", 30522, 2000,
      layers = Some(12), heads = Some(12), headDim = Some(64),
      pooling = "relu_log_max"))

  def byName(name: String): Option[OrtModelMeta] = all.find(_.name == name)

  /** Transformer working-set estimate in bytes for one input of
    * `seqLen` tokens — the reference's formula verbatim
    * (ort_runtime.rs:358-383): ((4·L·N²·D²) + L·N·S·(S+2D)) · 8 bytes,
    * +20% overhead; models without L/N/D metadata need no chunking → 1.
    */
  def requiredMemory(meta: OrtModelMeta, seqLen: Int): Long =
    (meta.layers, meta.heads, meta.headDim) match {
      case (Some(l), Some(n), Some(d)) =>
        val bytes = (4L * l * n.toLong * n * d.toLong * d
          + l.toLong * n * seqLen * (seqLen + 2L * d)) * 8L
        (bytes * 1.2).toLong
      case _ => 1L
    }

  /** Memory-bounded chunk size (chunk_session_input,
    * ort_runtime.rs:396-417): at most `batchSize`, at least 1, no more
    * inputs than fit the available memory at once. */
  def maxBatch(meta: OrtModelMeta, seqLen: Int, availableMemory: Long, batchSize: Int): Int =
    math.min(batchSize, math.max(1L, availableMemory / requiredMemory(meta, seqLen))).toInt
}

/** Deterministic stand-in tokenizer behind the tokenizer seam: lower,
  * split on non-alphanumerics, hash each token into a fixed vocab.
  * A real HF tokenizer.json loader plugs in via the constructor. */
trait OrtTokenizer extends Serializable {
  /** (inputIds, attentionMask), both padded to the batch max length. */
  def encodeBatch(texts: Seq[String], maxLen: Int): (Array[Array[Long]], Array[Array[Long]])
}

class HashOrtTokenizer(vocabSize: Int = 30522) extends OrtTokenizer {
  override def encodeBatch(
      texts: Seq[String], maxLen: Int): (Array[Array[Long]], Array[Array[Long]]) = {
    val tokenized = texts.map { t =>
      t.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
        .take(maxLen)
        .map(w => ((w.hashCode.toLong % vocabSize) + vocabSize) % vocabSize)
    }
    val width = math.max(1, if (tokenized.isEmpty) 1 else tokenized.map(_.length).max)
    val ids = tokenized.map(ts => ts.padTo(width, 0L).toArray).toArray
    val mask = tokenized.map(ts =>
      (Array.fill(ts.length)(1L) ++ Array.fill(width - ts.length)(0L))).toArray
    (ids, mask)
  }
}

/** Deterministic VISUAL session factory — the driver-verifiable
  * stand-in for a real clip ViT visual session (mirrors
  * [[HashEmbeddingRuntime]] for text): the embedding of an image is a
  * pure function of its pixels, recomputable in ANSI SQL:
  *
  *   h    = Σ_{i=0..n-1} pixel_i · (i+1)   mod 100003
  *   e[j] = HashEmbeddingRuntime.embedFromHash(h, dim)(j)
  *
  * Pixel tensors arrive through the session seam as float bit patterns
  * (see [[OrtEmbeddingRuntime.embedImageBatch]]); pixels are exact
  * small integers so the round-trip is lossless.
  */
object HashVisualSessionFactory extends OrtSessionFactory {
  override def create(model: String, provider: String): OrtSession = {
    val dim = OrtModels.byName(model).map(_.dim).getOrElse(
      throw new IllegalArgumentException(s"graft: unknown ort model '$model'"))
    new OrtSession {
      override def run(ids: Array[Array[Long]], mask: Array[Array[Long]])
          : Array[Array[Float]] =
        ids.map { row =>
          var h = 0L
          var i = 0
          while (i < row.length) {
            h += math.round(java.lang.Float.intBitsToFloat(row(i).toInt)).toLong * (i + 1)
            i += 1
          }
          HashEmbeddingRuntime.embedFromHash(
            ((h % HashEmbeddingRuntime.Mod) + HashEmbeddingRuntime.Mod)
              % HashEmbeddingRuntime.Mod, dim)
        }
    }
  }
}

/** The runtime. Sessions are created lazily per model with provider
  * fallback and cached for the JVM lifetime (the reference holds one
  * EncoderService per model). */
class OrtEmbeddingRuntime(
    // the default binds ai.onnxruntime reflectively when the jar is on
    // the classpath, NoOrtFactory otherwise — production closes the
    // seam by just installing the jar (no code change)
    factory: OrtSessionFactory = ReflectiveOrtFactory.orFallback(),
    tokenizer: OrtTokenizer = new HashOrtTokenizer(),
    providers: Seq[String] = Seq("cuda", "openvino", "cpu"),
    availableMemory: () => Long = () => {
      val rt = Runtime.getRuntime
      rt.maxMemory() - rt.totalMemory() + rt.freeMemory()
    },
    maxSeqLen: Int = 512) extends EmbeddingRuntime {

  override def name: String = "ort"

  override def models: Seq[ModelInfo] =
    OrtModels.all.filterNot(_.visual)
      .map(m => ModelInfo(m.name, m.dim, m.batchSize))

  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[String, (OrtSession, String)]()

  /** Provider actually serving `model` (after fallback), for
    * diagnostics; None until the session exists. */
  def activeProvider(model: String): Option[String] =
    Option(sessions.get(model)).map(_._2)

  private def session(model: String): (OrtSession, String) =
    sessions.computeIfAbsent(model, _ => {
      val errs = scala.collection.mutable.ArrayBuffer[String]()
      providers.iterator.map { p =>
        try Some((factory.create(model, p), p))
        catch { case e: Exception => errs += s"$p: ${e.getMessage}"; None }
      }.collectFirst { case Some(s) => s }
        .getOrElse(throw new IllegalStateException(
          s"graft: no execution provider could load '$model' " +
            s"(${errs.mkString("; ")})"))
    })

  override def embedBatch(
      model: String, inputs: Seq[String]): Seq[Either[String, Array[Float]]] = {
    val meta = OrtModels.byName(model).getOrElse(
      return inputs.map(_ => Left(s"unknown ort model '$model'")))
    if (meta.visual)
      return inputs.map(_ => Left(
        s"'$model' is an image encoder; use embedImageBatch"))
    val good = inputs.zipWithIndex.filter { case (t, _) => t != null && t.nonEmpty }
    val results = scala.collection.mutable.ArrayBuffer
      .fill[Either[String, Array[Float]]](inputs.size)(Left("empty input"))
    if (good.nonEmpty) {
      try {
        val (sess, _) = session(model)
        val (ids, mask) = tokenizer.encodeBatch(good.map(_._1), maxSeqLen)
        val seqLen = if (ids.isEmpty) 1 else ids(0).length
        // memory-aware chunking: the reference divides the batch so one
        // session call fits the available memory (ort_runtime.rs:396-417)
        val mb = OrtModels.maxBatch(meta, seqLen, availableMemory(), meta.batchSize)
        val out = (ids.grouped(mb) zip mask.grouped(mb)).flatMap {
          case (idChunk, maskChunk) => sess.run(idChunk, maskChunk)
        }.toArray
        require(out.length == good.size,
          s"graft: session returned ${out.length} embeddings for ${good.size} inputs")
        good.zip(out).foreach { case ((_, idx), v) =>
          results(idx) =
            if (v.length == meta.dim) Right(v)
            else Left(s"bad dim ${v.length} != ${meta.dim}")
        }
      } catch {
        case e: Exception =>
          good.foreach { case (_, idx) => results(idx) = Left(e.getMessage) }
      }
    }
    results.toSeq
  }

  /** Image-encoder path (clip ViT visual — `image_embedding`,
    * lantern_extras/src/embeddings.rs:154-199): pre-featurized pixel
    * tensors in, embeddings out. Inputs are float tensors because the
    * DECODE step lives in graft.multimodal (the codec-free container
    * stubs decoding; featurization and this session plumbing are real).
    */
  def embedImageBatch(
      model: String, pixels: Seq[Array[Float]]): Seq[Either[String, Array[Float]]] = {
    val meta = OrtModels.byName(model).getOrElse(
      return pixels.map(_ => Left(s"unknown ort model '$model'")))
    if (!meta.visual)
      return pixels.map(_ => Left(s"'$model' is not an image encoder"))
    val good = pixels.zipWithIndex.filter { case (p, _) => p != null && p.nonEmpty }
    val results = scala.collection.mutable.ArrayBuffer
      .fill[Either[String, Array[Float]]](pixels.size)(Left("empty input"))
    if (good.nonEmpty) {
      try {
        val (sess, _) = session(model)
        // pixel tensors ride the same session seam: quantized to long
        // "token" ids is wrong for real CLIP, but the session interface
        // is what a real ai.onnxruntime binding implements with float
        // tensors — the fake sessions in tests exercise the plumbing
        val ids = good.map(_._1.map(f =>
          java.lang.Float.floatToIntBits(f).toLong)).map(_.toArray).toArray
        val mask = ids.map(a => Array.fill(a.length)(1L))
        val mb = OrtModels.maxBatch(meta, if (ids.isEmpty) 1 else ids(0).length,
          availableMemory(), meta.batchSize)
        val out = (ids.grouped(mb) zip mask.grouped(mb)).flatMap {
          case (idChunk, maskChunk) => sess.run(idChunk, maskChunk)
        }.toArray
        require(out.length == good.size,
          s"graft: session returned ${out.length} embeddings for ${good.size} inputs")
        good.zip(out).foreach { case ((_, idx), v) =>
          results(idx) =
            if (v.length == meta.dim) Right(v)
            else Left(s"bad dim ${v.length} != ${meta.dim}")
        }
      } catch {
        case e: Exception =>
          good.foreach { case (_, idx) => results(idx) = Left(e.getMessage) }
      }
    }
    results.toSeq
  }

  override def complete(model: String, systemPrompt: String, userPrompt: String): String =
    throw new UnsupportedOperationException("graft: ort runtime is embeddings-only")
}
