package graft.embed

/** Reflection binding to `ai.onnxruntime` — closes the last embedding
  * seam WITHOUT a code change wherever the onnxruntime jar is on the
  * classpath. This build environment has no onnxruntime artifact (zero
  * egress), so the class is referenced by NAME only and
  * [[ReflectiveOrtFactory.orFallback]] degrades to [[NoOrtFactory]];
  * in production the same bytes bind the real runtime. Mirrors the
  * reference's session construction + provider registration
  * (lantern_cli/src/embeddings/core/ort_runtime.rs:306-316) and its
  * pooling strategies (cls / mean / relu_log_max,
  * ort_runtime.rs:419-474).
  *
  * Reflective surface (kept to the stable public ORT Java API):
  *   - `OrtEnvironment.getEnvironment()`
  *   - `new OrtSession.SessionOptions()`, `.addCUDA()`,
  *     `.addOpenVINO(String)` (CPU = default options)
  *   - `OrtEnvironment.createSession(String, SessionOptions)`
  *   - `OrtSession.getInputNames()`, `.run(java.util.Map)`
  *   - `OnnxTensor.createTensor(OrtEnvironment, Object)`
  *   - `Result.get(0)`, `OnnxValue.getValue()`, `.close()`
  *
  * Model files resolve as `<modelDir>/<model-name>/model.onnx` (the
  * reference's on-disk layout after its download step; model names
  * contain `/` and map to subdirectories).
  */
object ReflectiveOrtFactory {

  /** System property / spark-conf key naming the local model root. */
  val ModelDirProp = "spark.graft.ort.modelDir"

  def defaultModelDir: String =
    sys.props.getOrElse(ModelDirProp,
      sys.env.getOrElse("GRAFT_ORT_MODEL_DIR", "/models/ort"))

  /** Whether the ORT runtime classes are loadable in this JVM. */
  def available(loader: ClassLoader = classOf[OrtSession].getClassLoader): Boolean =
    try { Class.forName("ai.onnxruntime.OrtEnvironment", false, loader); true }
    catch { case _: ClassNotFoundException | _: NoClassDefFoundError => false }

  /** The best factory this JVM can offer: the reflective binding when
    * `ai.onnxruntime` is present, [[NoOrtFactory]] otherwise. */
  def orFallback(modelDir: String = defaultModelDir): OrtSessionFactory =
    if (available()) new ReflectiveOrtFactory(modelDir) else NoOrtFactory

  // ---- pooling (ort_runtime.rs:419-474) ----------------------------

  /** [batch][seq][hidden] token states → [batch][dim] by strategy. */
  private[embed] def pool(
      states: Array[Array[Array[Float]]],
      mask: Array[Array[Long]],
      pooling: String): Array[Array[Float]] = pooling match {
    case "cls" => states.map(_.head)
    case "mean" =>
      states.zip(mask).map { case (seq, m) =>
        val dim = if (seq.isEmpty) 0 else seq.head.length
        val acc = new Array[Float](dim)
        var n = 0
        var t = 0
        while (t < seq.length) {
          if (t < m.length && m(t) == 1L) {
            n += 1
            var j = 0
            while (j < dim) { acc(j) += seq(t)(j); j += 1 }
          }
          t += 1
        }
        if (n > 0) { var j = 0; while (j < dim) { acc(j) /= n; j += 1 } }
        acc
      }
    case "relu_log_max" =>
      // splade: max over tokens of log(1 + relu(x)), masked
      states.zip(mask).map { case (seq, m) =>
        val dim = if (seq.isEmpty) 0 else seq.head.length
        val acc = new Array[Float](dim)
        var t = 0
        while (t < seq.length) {
          if (t < m.length && m(t) == 1L) {
            var j = 0
            while (j < dim) {
              val v = math.log1p(math.max(0f, seq(t)(j))).toFloat
              if (v > acc(j)) acc(j) = v
              j += 1
            }
          }
          t += 1
        }
        acc
      }
    case other =>
      throw new IllegalArgumentException(s"graft: unknown pooling '$other'")
  }
}

class ReflectiveOrtFactory(modelDir: String) extends OrtSessionFactory {

  override def create(model: String, provider: String): OrtSession = {
    val meta = OrtModels.byName(model).getOrElse(
      throw new IllegalArgumentException(s"graft: unknown ort model '$model'"))
    // fail fast at create() so the runtime's provider-fallback loop can
    // move on; the session itself is rebuilt lazily after serialization
    val probe = new ReflectiveOrtSession(modelDir, model, provider, meta.pooling)
    probe.underlying
    probe
  }
}

/** One reflective session. Holds only strings + pooling; the JNI-backed
  * ORT objects live in a @transient lazy val, so shipping this object
  * to an executor re-creates the session there (the reference's
  * one-EncoderService-per-process shape).
  */
private[embed] class ReflectiveOrtSession(
    modelDir: String, model: String, provider: String, pooling: String)
    extends OrtSession {

  @transient private var sessionState: (AnyRef, AnyRef, Class[_]) = _

  private[embed] def underlying: (AnyRef, AnyRef, Class[_]) = synchronized {
    if (sessionState == null) {
      val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
      val env = envCls.getMethod("getEnvironment").invoke(null)
      val optCls = Class.forName("ai.onnxruntime.OrtSession$SessionOptions")
      val opts = optCls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
      provider match {
        case "cuda" => optCls.getMethod("addCUDA").invoke(opts)
        case "openvino" =>
          optCls.getMethod("addOpenVINO", classOf[String]).invoke(opts, "")
        case "cpu" => // default options run on CPU
        case other => throw new IllegalArgumentException(
          s"graft: unknown execution provider '$other'")
      }
      val path = s"$modelDir/$model/model.onnx"
      val sess = envCls
        .getMethod("createSession", classOf[String], optCls)
        .invoke(env, path, opts)
      sessionState = (env, sess, envCls)
    }
    sessionState
  }

  override def run(
      inputIds: Array[Array[Long]],
      attentionMask: Array[Array[Long]]): Array[Array[Float]] = {
    val (env, sess, envCls) = underlying
    val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
    val createTensor =
      tensorCls.getMethod("createTensor", envCls, classOf[Object])
    val sessCls = sess.getClass
    @SuppressWarnings(Array("unchecked"))
    val inputNames = sessCls.getMethod("getInputNames").invoke(sess)
      .asInstanceOf[java.util.Set[String]]
    val feeds = new java.util.HashMap[String, AnyRef]()
    val toClose = scala.collection.mutable.ArrayBuffer[AnyRef]()
    def feed(name: String, data: Array[Array[Long]]): Unit = {
      val t = createTensor.invoke(null, env, data).asInstanceOf[AnyRef]
      toClose += t
      feeds.put(name, t)
      ()
    }
    try {
      if (inputNames.contains("input_ids")) feed("input_ids", inputIds)
      if (inputNames.contains("attention_mask")) feed("attention_mask", attentionMask)
      if (inputNames.contains("token_type_ids"))
        feed("token_type_ids", inputIds.map(r => new Array[Long](r.length)))
      val runM = sessCls.getMethods.find(m =>
        m.getName == "run" && m.getParameterCount == 1 &&
          classOf[java.util.Map[_, _]].isAssignableFrom(m.getParameterTypes()(0)))
        .getOrElse(throw new IllegalStateException(
          "graft: ai.onnxruntime.OrtSession has no run(Map) method"))
      val result = runM.invoke(sess, feeds).asInstanceOf[AnyRef]
      try {
        val value = result.getClass.getMethod("get", classOf[Int])
          .invoke(result, Integer.valueOf(0))
        val raw = value.getClass.getMethod("getValue").invoke(value)
        raw match {
          case pooled: Array[Array[Float]] => pooled
          case states: Array[Array[Array[Float]]] =>
            ReflectiveOrtFactory.pool(states, attentionMask, pooling)
          case other => throw new IllegalStateException(
            s"graft: unexpected ORT output ${other.getClass}")
        }
      } finally closeQuietly(result)
    } finally toClose.foreach(closeQuietly)
  }

  private def closeQuietly(o: AnyRef): Unit =
    try o.getClass.getMethod("close").invoke(o)
    catch { case _: Exception => () }
}
