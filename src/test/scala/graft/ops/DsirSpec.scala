package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private val Buckets = 64

  private def corpus = Seq(
    (1L, "the cat sat on the mat", "en"),
    (2L, "the dog ate the cat food", "en"),
    (3L, "le chat est sur le tapis", "fr"),
    (4L, "der hund frisst das futter", "de"),
    (5L, "the the the the", "en"),
    (6L, "", "en"),
    (7L, null.asInstanceOf[String], "fr")
  ).toDF("doc_id", "text", "lang")

  test("native score equals the declarative explode+join form") {
    val docs = corpus.where($"text".isNotNull)
    val lambda = Dsir.fit(docs.where($"lang" === "en"), docs, "text", Buckets)
    val lamDf = lambda.zipWithIndex
      .map { case (l, b) => (b, l) }.toSeq.toDF("bucket", "lam")

    val declarative = docs
      .select($"doc_id", explode(Dsir.hashedGrams($"text", Buckets)).as("bucket"))
      .join(lamDf, "bucket")
      .groupBy("doc_id").agg(sum("lam").as("logw"))
    val native = Dsir.logWeights(docs, "doc_id", "text", lambda, Buckets)

    val d = declarative.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = native.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 6 has no tokens: absent from the join form, 0.0 natively
    assert(n(6L) === 0.0)
    (d.keySet).foreach { id =>
      assert(math.abs(d(id) - n(id)) < 1e-9, s"doc $id: ${d(id)} vs ${n(id)}")
    }
  }

  test("target-domain docs weigh higher than off-domain docs") {
    val docs = corpus.where($"text".isNotNull && length($"text") > 0)
    val lambda = Dsir.fit(docs.where($"lang" === "en"), docs, "text", Buckets)
    val w = Dsir.logWeights(docs, "doc_id", "text", lambda, Buckets)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // per-token normalization isn't part of DSIR, so compare docs of
    // similar length: English doc 1 vs French doc 3 (6 tokens each)
    assert(w(1L) > w(3L))
    assert(w(2L) > w(4L))
  }

  test("select returns k rows, weight-desc, deterministic") {
    val a = Dsir.select(corpus, "doc_id", "text", $"lang" === "en", k = 3,
      buckets = Buckets)
    val b = Dsir.select(corpus, "doc_id", "text", $"lang" === "en", k = 3,
      buckets = Buckets)
    val ra = a.collect(); val rb = b.collect()
    assert(ra.length == 3)
    assert(ra.map(_.getLong(0)).toSeq == rb.map(_.getLong(0)).toSeq)
    val keys = ra.map(_.getDouble(2))
    assert(keys.sorted.reverse.toSeq == keys.toSeq)
  }

  test("gumbel-perturbed select is deterministic under a fixed seed") {
    val a = Dsir.select(corpus, "doc_id", "text", $"lang" === "en", k = 3,
      buckets = Buckets, gumbelSeed = Some(42L))
    val b = Dsir.select(corpus, "doc_id", "text", $"lang" === "en", k = 3,
      buckets = Buckets, gumbelSeed = Some(42L))
    assert(a.collect().toSeq == b.collect().toSeq)
    // and the key actually differs from the unperturbed one
    val plain = Dsir.select(corpus, "doc_id", "text", $"lang" === "en", k = 3,
      buckets = Buckets)
    val pk = plain.collect().map(r => r.getDouble(2)).toSeq
    val gk = a.collect().map(r => r.getDouble(2)).toSeq
    assert(pk != gk)
  }
}
