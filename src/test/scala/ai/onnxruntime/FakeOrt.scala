package ai.onnxruntime

/** TEST-ONLY fakes with the exact class/method shapes of the public
  * `ai.onnxruntime` Java API that [[graft.embed.ReflectiveOrtFactory]]
  * binds by reflection — presence of these classes on the test
  * classpath IS the "onnxruntime jar installed" scenario. The fake
  * session emits deterministic [batch][seq][hidden] token states so
  * the pooling paths get exercised end-to-end. CPU-only: the CUDA and
  * OpenVINO provider hooks throw, proving the provider-fallback loop.
  */
class OrtEnvironment private[onnxruntime] () {
  def createSession(path: String, opts: OrtSession.SessionOptions): OrtSession = {
    require(path.endsWith("/model.onnx"), s"fake ort: bad model path $path")
    new OrtSession(path, opts)
  }
}

object OrtEnvironment {
  private val inst = new OrtEnvironment
  def getEnvironment(): OrtEnvironment = inst
}

class OnnxTensor private[onnxruntime] (val data: AnyRef) {
  def close(): Unit = ()
}

object OnnxTensor {
  def createTensor(env: OrtEnvironment, data: AnyRef): OnnxTensor =
    new OnnxTensor(data)
}

class OnnxValue private[onnxruntime] (v: AnyRef) {
  def getValue(): AnyRef = v
  def close(): Unit = ()
}

class OrtSession private[onnxruntime] (
    path: String, opts: OrtSession.SessionOptions) {

  // "<modelDir>/<org>/<name>/model.onnx" → "<org>/<name>"
  private val modelName = path.stripSuffix("/model.onnx")
    .split('/').takeRight(2).mkString("/")
  private val dim = graft.embed.OrtModels.byName(modelName)
    .map(_.dim).getOrElse(4)

  def getInputNames(): java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    s.add("input_ids"); s.add("attention_mask"); s.add("token_type_ids")
    s
  }

  def run(feeds: java.util.Map[String, AnyRef]): OrtSession.Result = {
    val ids = feeds.get("input_ids").asInstanceOf[OnnxTensor]
      .data.asInstanceOf[Array[Array[Long]]]
    val mask = feeds.get("attention_mask").asInstanceOf[OnnxTensor]
      .data.asInstanceOf[Array[Array[Long]]]
    require(feeds.containsKey("token_type_ids"),
      "fake ort: token_type_ids requested but not fed")
    val states: Array[Array[Array[Float]]] = ids.zip(mask).map { case (row, m) =>
      row.indices.map { t =>
        // masked positions carry garbage on purpose — pooling must skip them
        Array.tabulate(dim)(j =>
          if (t < m.length && m(t) == 1L) ((row(t) % 7) + (j % 3)).toFloat
          else 999f)
      }.toArray
    }
    new OrtSession.Result(new OnnxValue(states))
  }
}

object OrtSession {
  class SessionOptions {
    def addCUDA(): Unit =
      throw new UnsupportedOperationException("fake ort: no CUDA device")
    def addOpenVINO(dir: String): Unit =
      throw new UnsupportedOperationException("fake ort: no OpenVINO")
  }

  class Result private[onnxruntime] (value: OnnxValue) {
    def get(i: Int): OnnxValue = value
    def close(): Unit = ()
  }
}
