package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.l2sq_dist
import graft.text.Stopwords

class MaskedExplainSpec extends SparkTestBase {

  test("masked_explain collapses vector literals, keeps plan structure") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val q = e.select("embedding").head().getSeq[Float](0).toArray
    val df = e.orderBy(l2sq_dist(col("embedding"), lit(q))).limit(5)
    val plain = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    val masked = MaskedExplain.explain(df, "simple")
    assert(plain.count(_ == ',') > 60, "unmasked plan should carry the raw vector")
    assert(masked.contains("<vector("), s"masked plan: ${masked.take(400)}")
    assert(masked.length < plain.length / 2)
    assert(masked.contains("TakeOrderedAndProject") || masked.contains("Sort"))
  }

  test("mask() leaves small non-vector arrays alone") {
    assert(MaskedExplain.mask("cast([1, 2] as x)") === "cast([1, 2] as x)")
    assert(MaskedExplain.mask("[0.1,0.2,0.3,0.4,0.5]") === "<vector(5)>")
  }

  test("user stopwords persist in session conf and extend the analyzer") {
    import graft.functions.text_to_stem_array
    import spark.implicits._
    assert(Stopwords.getUserStopwords(spark).isEmpty)
    Stopwords.setUserStopwords(spark, Seq("banana", "Kiwi"))
    try {
      assert(Stopwords.getUserStopwords(spark) === Seq("banana", "kiwi"))
      val stems = Seq("the banana kiwi orange").toDF("t")
        .select(text_to_stem_array($"t", Stopwords.effective(spark)))
        .head().getSeq[String](0)
      assert(!stems.contains("banana") && !stems.contains("kiwi"))
      assert(stems.contains("orang"))
    } finally spark.conf.unset(Stopwords.ConfKey)
  }
}
