package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TextPrepSpec extends SparkTestBase {
  import spark.implicits._

  test("chunkByTokens: window/stride/last-chunk edge cases") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks: 2 chunks
      (2L, (1 to 4).map(i => s"t$i").mkString(" ")),  // 4 = maxTokens: 1 chunk
      (3L, "one"),                                    // short: 1 chunk
      (4L, "   "),                                    // token-free: 0 chunks
      (5L, (1 to 8).map(i => s"t$i").mkString(" "))   // exact 2 full windows
    ).toDF("doc_id", "text")
    // maxTokens=4, overlap=2 → stride 2
    val out = TextPrep.chunkByTokens(docs, "doc_id", "text", 4, 2)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, Int, String)].collect()

    val d1 = out.filter(_._1 == 1L)
    assert(d1.length == 4) // starts 1,3,5,7 → covers to 10
    assert(d1.head._4 == "t1 t2 t3 t4")
    assert(d1.last._4 == "t7 t8 t9 t10")
    assert(d1.forall(_._3 == 4))
    assert(out.filter(_._1 == 2L).map(_._4).toSeq == Seq("t1 t2 t3 t4"))
    assert(out.filter(_._1 == 3L).map(_._4).toSeq == Seq("one"))
    assert(!out.exists(_._1 == 4L))
    val d5 = out.filter(_._1 == 5L)
    // 8 toks, stride 2: starts 1,3,5 → last covers 5..8
    assert(d5.length == 3 && d5.last._3 == 4)
    // every token covered exactly per the window formula
    assert(d5.map(_._4).toSeq == Seq("t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8"))
  }

  test("cleanText: NFC composes, zero-width dropped, NBSP→space, controls stripped") {
    val dirty = "caf" + "e\u0301" + "\u200B" + " a\u00A0b" + "\u0007" + "\u0085" + "\tok\n"
    val out = Seq(dirty).toDF("t")
      .select(TextPrep.cleanText($"t").as("c")).as[String].head()
    assert(out == "caf\u00E9 a b\tok\n") // é precomposed; tab/newline survive
  }

  test("collapseRepeatedLines: adjacent dups fold, non-adjacent survive") {
    val docs = Seq(
      (1L, "a\na\nb\na\nb\nb\nb\nc"),
      (2L, "x"),
      (3L, "s\ns")
    ).toDF("doc_id", "text")
    val out = TextPrep.collapseRepeatedLines(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out(0)._2 == "a\nb\na\nb\nc") // non-adjacent 'a'/'b' kept
    assert(out(1)._2 == "x")
    assert(out(2)._2 == "s")
  }

  test("sentenceSplit: terminator runs, trailing fragment, empties dropped") {
    val docs = Seq(
      (1L, "One. Two! Three?? Four... tail no dot"),
      (2L, "!!"),
      (3L, "only a fragment")
    ).toDF("doc_id", "text")
    val out = TextPrep.sentenceSplit(docs, "doc_id", "text")
      .orderBy("doc_id", "sent_id").as[(Long, Int, String)].collect()
    assert(out.filter(_._1 == 1L).map(_._3).toSeq ==
      Seq("One.", "Two!", "Three??", "Four...", "tail no dot"))
    // terminator-only text has no sentence content → no rows
    assert(!out.exists(_._1 == 2L))
    assert(out.filter(_._1 == 3L).map(_._3).toSeq == Seq("only a fragment"))
    assert(out.filter(_._1 == 1L).map(_._2).toSeq == (0 until 5))
  }

  test("compressionRatio: bounds, repetition sensitivity, codegen, null/empty") {
    import graft.text.TextAnalysis
    val df = Seq(
      ("a" * 1000, "repeat"),
      ("The quick brown fox jumps over the lazy dog. " * 30, "template"),
      (java.util.UUID.randomUUID().toString * 20, "mixed"),
      ("", "empty")).toDF("text", "tag")
    val rows = df.select($"tag", TextAnalysis.compressionRatio($"text").as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("empty") == 0.0)
    assert(rows("repeat") < 0.05, s"repeat ${rows("repeat")}")
    assert(rows("repeat") < rows("template"), rows.toString)
    assert(rows("template") < rows("mixed"), rows.toString)
    assert(rows.values.forall(r => r >= 0.0 && r <= 1.5))
    // high-entropy input stays near/above 1 (deflate adds overhead)
    val rnd = new scala.util.Random(3)
    val noise = Array.fill(4096)((rnd.nextInt(94) + 33).toChar).mkString
    val rNoise = Seq(Tuple1(noise)).toDF("text")
      .select(TextAnalysis.compressionRatio($"text")).head().getDouble(0)
    assert(rNoise > 0.8, s"noise $rNoise")
    // null-safe and codegen'd (no ScalaUDF; starred Project)
    val withNull = Seq(Some("abc"), None).map(Tuple1(_)).toDF("text")
      .select(TextAnalysis.compressionRatio($"text").as("r"))
    assert(withNull.collect().map(r => r.isNullAt(0)).toSeq == Seq(false, true))
    val plan = graft.ops.MaskedExplain.explain(
      graft.Tables.documents(spark, sf("sf0.001"))
        .select(TextAnalysis.compressionRatio($"text")), "formatted")
    assert(plan.contains("* Project"), plan.take(400))
  }
}
