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

  test("TokenChunker: truncation at the pre-token boundary, greedy grouping") {
    val (t1, n1) = TokenChunker.truncate("alpha beta gamma delta", 2)
    assert(t1 == "alpha beta" && n1 == 2)
    val (t2, n2) = TokenChunker.truncate("one two", 10)
    assert(t2 == "one two" && n2 == 2) // under limit: untouched
    val (t3, n3) = TokenChunker.truncate("x y z", 0)
    assert(t3 == "x y z" && n3 == 3) // 0 = unlimited

    val items = Seq(("a", 0, 5), ("b", 1, 4), ("c", 2, 4), ("d", 3, 9))
    val grps = TokenChunker.group(items, budget = 9)
    assert(grps.map(_.map(_._1)) == Seq(Seq("a", "b"), Seq("c"), Seq("d")))
    assert(TokenChunker.group(Nil, 9).isEmpty)
    assert(TokenChunker.group(items, 0) == Seq(items)) // 0 = one group
  }

  test("TokenChunker randomized invariants: prefix, bounds, order, budget") {
    val rnd = new scala.util.Random(20260813L)
    val vocab = Seq("alpha", "beta!", "42", "x", "longword", ",", "  ")
    (0 until 200).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(60))(vocab(rnd.nextInt(vocab.size)))
        .mkString(rnd.nextInt(3) match { case 0 => " "; case 1 => ""; case _ => "\t" })
      val m = rnd.nextInt(20)
      val (cut, n) = TokenChunker.truncate(text, m)
      assert(text.startsWith(cut), s"'$cut' not a prefix of '$text'")
      if (m > 0) assert(n <= m, s"n=$n > m=$m for '$text'")
      // re-truncating the cut is a fixpoint (it already fits)
      if (m > 0) assert(TokenChunker.truncate(cut, m)._1 == cut)
    }
    (0 until 200).foreach { _ =>
      val budget = 1 + rnd.nextInt(30)
      val items = Seq.tabulate(rnd.nextInt(12)) { i =>
        (s"t$i", i, 1 + rnd.nextInt(budget)) // each item fits the budget
      }
      val grps = TokenChunker.group(items, budget)
      assert(grps.flatten == items, "order/content preserved")
      assert(grps.forall(_.nonEmpty), "no empty groups")
      assert(grps.forall(_.map(_._3).sum <= budget),
        s"budget $budget exceeded: ${grps.map(_.map(_._3).sum)}")
    }
  }

  test("openai runtime splits oversized batches by token budget and truncates long inputs") {
    val dim = 1536
    val vec = (1 to dim).map(_ => "0.1").mkString(",")
    val fake = new FakeTransport((_, body) => {
      val n = body.split("\\\"input\\\":\\[")(1).takeWhile(_ != ']').count(_ == ',') + 1
      (1 to n).map(_ => s"""{"object":"embedding","embedding":[$vec]}""")
        .mkString("""{"data":[""", ",", "]}")
    })
    val rt = new OpenAiEmbeddingRuntime(apiKey = "k", transport = fake)
    // 5000 pre-tokens each: all three share ONE request under the
    // 300k per-request budget — seqLen truncates individuals, it no
    // longer doubles as the packing budget (which forced one request
    // per near-limit input)
    val big = ("word " * 5000).trim
    val out = rt.embedBatch("text-embedding-ada-002", Seq(big, big, big))
    assert(out.forall(_.isRight))
    assert(fake.calls.size == 1, s"${fake.calls.size} requests")
    // 61 × 5000 = 305k tokens exceeds the 300k request budget → split
    fake.calls = Nil
    assert(rt.embedBatch("text-embedding-ada-002", Seq.fill(61)(big))
      .forall(_.isRight))
    assert(fake.calls.size == 2, s"${fake.calls.size} requests")
    // 9000-token input is truncated to the 8190-pre-token prefix
    fake.calls = Nil
    val huge = ("word " * 9000).trim
    assert(rt.embedBatch("text-embedding-ada-002", Seq(huge)).head.isRight)
    val sent = fake.calls.head._2.split("\\\"input\\\":\\[\\\"")(1).takeWhile(_ != '"')
    assert(sent.split(" ").length == 8190, s"${sent.split(" ").length} tokens sent")
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
