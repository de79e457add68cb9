package graft.embed

import org.scalatest.funsuite.AnyFunSuite

/** Ort runtime behind fake sessions — the same testing posture as
  * ApiRuntimeSpec (fake transport): the session seam is faked, the
  * request building / chunking / provider fallback / failure routing
  * around it is exercised for real.
  */
class OrtRuntimeSpec extends AnyFunSuite {

  /** Session echoing deterministic embeddings; records batch sizes. */
  private class FakeSession(dim: Int) extends OrtSession {
    val batchSizes = scala.collection.mutable.ArrayBuffer[Int]()
    override def run(ids: Array[Array[Long]], mask: Array[Array[Long]])
        : Array[Array[Float]] = {
      batchSizes += ids.length
      ids.map(row => Array.tabulate(dim)(j =>
        (row.sum + mask.length + j).toFloat))
    }
  }

  private def factoryFor(
      s: OrtSession, okProviders: Set[String]): OrtSessionFactory =
    new OrtSessionFactory {
      override def create(model: String, provider: String): OrtSession =
        if (okProviders(provider)) s
        else throw new IllegalStateException(s"$provider unavailable")
    }

  test("model map matches the reference inventory (ort_runtime.rs:284-302)") {
    assert(OrtModels.all.size == 17)
    val names = OrtModels.all.map(_.name).toSet
    Seq("clip/ViT-B-32-textual", "clip/ViT-B-32-visual", "BAAI/bge-m3",
      "intfloat/e5-large-v2", "jinaai/jina-embeddings-v2-base-en",
      "naver/splade-v3", "microsoft/all-MiniLM-L12-v2")
      .foreach(n => assert(names(n), n))
    // only text encoders are listable as embedding models
    val rt = new OrtEmbeddingRuntime()
    assert(!rt.models.exists(_.name == "clip/ViT-B-32-visual"))
    assert(rt.models.size == 16)
    assert(EmbeddingRuntimes.availableRuntimes.contains("ort"))
  }

  test("provider fallback: cuda fails, openvino fails, cpu serves") {
    val s = new FakeSession(384)
    val rt = new OrtEmbeddingRuntime(factoryFor(s, Set("cpu")))
    val out = rt.embedBatch("BAAI/bge-small-en", Seq("hello world"))
    assert(out.head.isRight)
    assert(rt.activeProvider("BAAI/bge-small-en").contains("cpu"))
  }

  test("no provider at all: every input fails, job does not throw") {
    val rt = new OrtEmbeddingRuntime(factoryFor(new FakeSession(384), Set.empty))
    val out = rt.embedBatch("BAAI/bge-small-en", Seq("a", "b"))
    assert(out.forall(_.isLeft))
    assert(out.head.swap.exists(_.contains("no execution provider")))
  }

  test("memory-aware chunking splits the batch (reference formula)") {
    val meta = OrtModels.byName("BAAI/bge-m3").get
    // the formula itself: L=8,N=4,D=64 at seqLen 128
    val oneInput = OrtModels.requiredMemory(meta, 128)
    val expected = ((4L * 8 * 16 * 64 * 64 + 8L * 4 * 128 * (128 + 128)) * 8 * 1.2).toLong
    assert(oneInput == expected)
    // metadata-free models need no chunking
    assert(OrtModels.requiredMemory(OrtModels.byName("BAAI/bge-small-en").get, 128) == 1L)

    // memory for exactly 3 inputs → batches of <= 3
    val s = new FakeSession(1024)
    val rt = new OrtEmbeddingRuntime(
      factoryFor(s, Set("cpu")),
      availableMemory = () => OrtModels.requiredMemory(meta, 2) * 3)
    val out = rt.embedBatch("BAAI/bge-m3", Seq("a b", "c d", "e f", "g h", "i j"))
    assert(out.forall(_.isRight))
    assert(s.batchSizes.forall(_ <= 3), s.batchSizes)
    assert(s.batchSizes.sum == 5)
  }

  test("null/empty inputs fail locally; session sees only good ones") {
    val s = new FakeSession(384)
    val rt = new OrtEmbeddingRuntime(factoryFor(s, Set("cpu")))
    val out = rt.embedBatch("BAAI/bge-small-en", Seq("ok", "", null, "fine"))
    assert(out(0).isRight && out(3).isRight)
    assert(out(1) == Left("empty input") && out(2) == Left("empty input"))
    assert(s.batchSizes.sum == 2)
  }

  test("dim mismatch from the session becomes a per-row failure") {
    val rt = new OrtEmbeddingRuntime(factoryFor(new FakeSession(7), Set("cpu")))
    val out = rt.embedBatch("BAAI/bge-small-en", Seq("x"))
    assert(out.head.swap.exists(_.contains("bad dim 7 != 384")))
  }

  test("image path: visual model embeds pixel tensors, text model refuses") {
    val s = new FakeSession(512)
    val rt = new OrtEmbeddingRuntime(factoryFor(s, Set("cpu")))
    val px = Array.fill(12)(0.5f)
    val out = rt.embedImageBatch("clip/ViT-B-32-visual", Seq(px, Array.empty[Float]))
    assert(out(0).isRight && out(0).exists(_.length == 512))
    assert(out(1) == Left("empty input"))
    assert(rt.embedImageBatch("BAAI/bge-small-en", Seq(px))
      .head.swap.exists(_.contains("not an image encoder")))
    assert(rt.embedBatch("clip/ViT-B-32-visual", Seq("text"))
      .head.swap.exists(_.contains("use embedImageBatch")))
  }

  test("tokenizer pads and masks to the batch max length") {
    val (ids, mask) = new HashOrtTokenizer().encodeBatch(Seq("one two three", "one"), 512)
    assert(ids(0).length == 3 && ids(1).length == 3)
    assert(mask(0).toSeq == Seq(1L, 1L, 1L))
    assert(mask(1).toSeq == Seq(1L, 0L, 0L))
    assert(ids(1)(1) == 0L && ids(1)(2) == 0L)
  }

  test("reflective factory binds ai.onnxruntime when present (test fakes)") {
    // the fake ai.onnxruntime classes ARE on the test classpath
    assert(ReflectiveOrtFactory.available())
    val factory = ReflectiveOrtFactory.orFallback("/tmp/graft-ort-models")
    assert(factory.isInstanceOf[ReflectiveOrtFactory])
    // provider fallback through the REAL runtime loop: fake CUDA and
    // OpenVINO hooks throw, CPU serves
    val rt = new OrtEmbeddingRuntime(factory)
    val out = rt.embedBatch("BAAI/bge-small-en", Seq("hello world", "again"))
    assert(out.forall(_.isRight), out)
    assert(out.forall(_.exists(_.length == 384)))
    assert(rt.activeProvider("BAAI/bge-small-en") == Some("cpu"))
    // deterministic: the same text embeds identically across calls
    val again = rt.embedBatch("BAAI/bge-small-en", Seq("hello world")).head
    assert(out.head.exists(v => again.exists(v.sameElements(_))))
    // serialization round-trip rebuilds the JNI-backed state lazily
    val bos = new java.io.ByteArrayOutputStream()
    val sess = factory.create("BAAI/bge-small-en", "cpu")
    new java.io.ObjectOutputStream(bos).writeObject(sess)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[OrtSession]
    val (ids, mask) = new HashOrtTokenizer().encodeBatch(Seq("hello world"), 16)
    assert(back.run(ids, mask).head.sameElements(sess.run(ids, mask).head))
  }

  test("reflective factory degrades gracefully when ai.onnxruntime is absent") {
    // a loader with bootstrap-only visibility cannot see the fakes —
    // exactly a production JVM without the onnxruntime jar
    val empty = new java.net.URLClassLoader(Array.empty, null)
    assert(!ReflectiveOrtFactory.available(empty))
    // NoOrtFactory (the orFallback absence branch) raises the guiding
    // error, and the runtime converts it into per-row failures
    val rt = new OrtEmbeddingRuntime(NoOrtFactory)
    val out = rt.embedBatch("BAAI/bge-small-en", Seq("x"))
    assert(out.head.swap.exists(_.contains("no execution provider")))
  }

  test("pooling strategies: cls, mean (mask-aware), relu_log_max") {
    val states = Array(Array(
      Array(1f, -2f, 3f),
      Array(5f, 4f, -1f),
      Array(999f, 999f, 999f))) // masked out
    val mask = Array(Array(1L, 1L, 0L))
    assert(ReflectiveOrtFactory.pool(states, mask, "cls").head.toSeq ==
      Seq(1f, -2f, 3f))
    assert(ReflectiveOrtFactory.pool(states, mask, "mean").head.toSeq ==
      Seq(3f, 1f, 1f))
    val slm = ReflectiveOrtFactory.pool(states, mask, "relu_log_max").head
    assert(slm(0) == math.log1p(5.0).toFloat)
    assert(slm(1) == math.log1p(4.0).toFloat)
    assert(slm(2) == math.log1p(3.0).toFloat)
    intercept[IllegalArgumentException] {
      ReflectiveOrtFactory.pool(states, mask, "nope")
    }
  }
}
