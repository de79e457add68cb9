package graft.embed

import graft.SparkTestBase

class ApiRuntimeSpec extends SparkTestBase {

  private class FakeTransport(respond: (String, String) => String) extends HttpTransport {
    var calls: List[(String, String)] = Nil
    override def post(url: String, body: String, headers: Map[String, String]): String = {
      calls ::= (url, body)
      respond(url, body)
    }
  }

  test("openai runtime builds the /v1/embeddings request and parses data[].embedding") {
    val dim = 1536
    val vec = (1 to dim).map(i => s"0.$i").mkString(",")
    val fake = new FakeTransport((_, body) => {
      val n = "\"input\":\\[".r.findFirstIn(body).map(_ =>
        body.split("\\\"input\\\":\\[")(1).takeWhile(_ != ']').count(_ == ',') + 1).get
      (1 to n).map(_ => s"""{"object":"embedding","embedding":[$vec]}""")
        .mkString("""{"data":[""", ",", "]}")
    })
    val rt = new OpenAiEmbeddingRuntime(apiKey = "k", transport = fake)
    val out = rt.embedBatch("text-embedding-3-small", Seq("hello", "world"))
    assert(out.size === 2)
    assert(out.forall(_.isRight))
    assert(out.head.toOption.get.length === dim)
    assert(fake.calls.head._1.endsWith("/embeddings"))
    assert(fake.calls.head._2.contains("\"model\":\"text-embedding-3-small\""))
  }

  test("openai completion extracts message content") {
    val fake = new FakeTransport((_, _) =>
      """{"choices":[{"message":{"role":"assistant","content":"hi there"}}]}""")
    val rt = new OpenAiEmbeddingRuntime(apiKey = "k", transport = fake)
    assert(rt.complete("gpt-x", "sys", "say hi") === "hi there")
    assert(fake.calls.head._2.contains("\"role\":\"system\""))
  }

  test("cohere runtime parses nested embeddings array") {
    val vec = (1 to 1024).map(_ => "0.5").mkString(",")
    val fake = new FakeTransport((_, _) => s"""{"embeddings":[[$vec],[$vec]]}""")
    val rt = new CohereEmbeddingRuntime(apiKey = "k", transport = fake)
    val out = rt.embedBatch("embed-english-v3.0", Seq("a", "b"))
    assert(out.size === 2 && out.forall(_.isRight))
  }

  test("no-egress default fails rows, never the job; registry lists api runtimes") {
    val rt = new OpenAiEmbeddingRuntime()
    val out = rt.embedBatch("text-embedding-ada-002", Seq("x"))
    assert(out.head.isLeft)
    assert(out.head.swap.toOption.get.contains("no network egress"))
    assert(EmbeddingRuntimes.availableRuntimes.toSet
      .intersect(Set("openai", "cohere", "hash-mock")).size === 3)
  }

  test("null/empty inputs fail locally and never reach the API") {
    val fake = new FakeTransport((_, body) => {
      assert(!body.contains("\"\""), s"empty input leaked into request: $body")
      """{"data":[{"embedding":[0.1,0.2]}]}"""
    })
    val rt = new OpenAiEmbeddingRuntime(apiKey = "k", transport = fake)
    val out = rt.embedBatch("text-embedding-ada-002", Seq(null, "", "x"))
    assert(out(0).swap.toOption.get === "empty input")
    assert(out(1).swap.toOption.get === "empty input")
    assert(out(2).isLeft && out(2).swap.toOption.get.contains("bad dim"))
    assert(fake.calls.size === 1, "one API call for the one good input")
  }

  test("dim mismatch from the API becomes a per-row error") {
    val fake = new FakeTransport((_, _) =>
      """{"data":[{"embedding":[0.1,0.2]}]}""")
    val rt = new OpenAiEmbeddingRuntime(apiKey = "k", transport = fake)
    val out = rt.embedBatch("text-embedding-3-large", Seq("short"))
    assert(out.head.isLeft && out.head.swap.toOption.get.contains("bad dim"))
  }
}
