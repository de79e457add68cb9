package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class NbClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the cat sat on the mat with the dog", "en"),
    (2L, "the dog ate the food and the cat slept", "en"),
    (3L, "le chat est sur le tapis avec le chien", "fr"),
    (4L, "le chien mange et le chat dort bien", "fr"),
    (5L, "der hund frisst und die katze schlaeft", "de"),
    (6L, "die katze sitzt auf der matte mit der hund", "de")
  ).toDF("doc_id", "text", "lang")

  test("separable corpus: predictions recover training labels") {
    val m = NbClassifier.fit(corpus, "lang", "text", buckets = 512)
    assert(m.classes.toSeq == Seq("de", "en", "fr")) // sorted
    val preds = NbClassifier.predict(corpus, "doc_id", "text", m)
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(preds == Map(1L -> "en", 2L -> "en", 3L -> "fr", 4L -> "fr",
      5L -> "de", 6L -> "de"))
  }

  test("token-free docs get the prior argmax; ties break to first class") {
    val skewed = corpus.unionByName(
      Seq((7L, "extra english text here", "en")).toDF("doc_id", "text", "lang"))
    val m = NbClassifier.fit(skewed, "lang", "text", buckets = 512)
    val pred = NbClassifier.predict(
      Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text", m)
      .select("pred").as[String].head()
    assert(pred == "en") // highest prior (3 docs vs 2/2)

    // equal priors → prior-only scores tie → lexicographically-first
    val m2 = NbClassifier.fit(corpus, "lang", "text", buckets = 512)
    val pred2 = NbClassifier.predict(
      Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text", m2)
      .select("pred").as[String].head()
    assert(pred2 == "de")
  }

  test("null text excluded from fit and predict") {
    val withNull = corpus.unionByName(
      Seq((8L, null.asInstanceOf[String], "en")).toDF("doc_id", "text", "lang"))
    val m = NbClassifier.fit(withNull, "lang", "text", buckets = 512)
    val out = NbClassifier.predict(withNull, "doc_id", "text", m)
    assert(out.count() == 6)
  }
}
