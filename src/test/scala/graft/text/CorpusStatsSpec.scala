package graft.text

import graft.SparkTestBase

class CorpusStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("byLanguage: hand-computed counts, totals and exact percentiles") {
    val docs = Seq(
      (1L, "en", "one two three"), // 3 tokens, 13 chars
      (2L, "en", "a b c d e"), // 5 tokens, 9 chars
      (3L, "en", "w x"), // 2 tokens, 3 chars
      (4L, "de", "ein zwei")) // 2 tokens, 8 chars
      .toDF("doc_id", "lang", "text")
    val rows = CorpusStats.byLanguage(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> r).toMap

    val en = rows("en")
    assert(en.getLong(1) == 3) // n_docs
    assert(en.getLong(2) == 10) // total tokens
    assert(en.getDouble(3) == 3.3333) // avg rounded
    // exact percentile over [2,3,5]: p50 = 3, p90 = index 0.9*2=1.8 →
    // 3 + 0.8*(5-3) = 4.6
    assert(en.getDouble(4) == 3.0)
    assert(math.abs(en.getDouble(5) - 4.6) < 1e-9)
    assert(en.getDouble(7) == 8.3333) // avg_chars 25/3 rounded to 4 places

    val de = rows("de")
    assert(de.getLong(1) == 1 && de.getLong(2) == 2)

    // overall collapses the key
    val all = CorpusStats.overall(docs, "text").collect()
    assert(all.length == 1 && all(0).getLong(0) == 4 && all(0).getLong(1) == 12)
  }

  test("approxProfile: sketches land on exact values at spec scale") {
    val docs = (1L to 200L).map { i =>
      (i, if (i % 3 == 0) "de" else "en",
        (1L to (i % 17 + 3)).map(j => s"w${(i * 31 + j * 7) % 97}")
          .mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val approx = CorpusStats.approxProfile(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx("en").getLong(1) == 134 && approx("de").getLong(1) == 66)
    // 97 possible distinct tokens per lang; rsd 0.02 keeps HLL within
    // a few % at this cardinality
    assert(math.abs(approx("en").getLong(2) - 97) <= 5)

    // the gate keeps both languages (sketches within tolerance) and
    // emits exact values
    val gate = CorpusStats.approxProfileGate(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(gate.size == 2)
    assert(gate("en").getLong(2) == 97)
  }

  test("vocabSketch increments union to the whole-corpus sketch exactly") {
    import spark.implicits._
    val docs = (0L until 200L)
      .map(i => (i, s"tok${i % 40} word${i % 17} shared common"))
      .toDF("doc_id", "text")
    val a = CorpusStats.vocabSketch(docs.where($"doc_id" % 2 === 0), "text")
    val b = CorpusStats.vocabSketch(docs.where($"doc_id" % 2 === 1), "text")
    val viaIncrements = CorpusStats.vocabUnionEstimate(a.unionByName(b))
    val whole = CorpusStats.vocabUnionEstimate(
      CorpusStats.vocabSketch(docs, "text"))
    // DataSketches HLL unions are LOSSLESS at equal lgK: the split
    // pipeline must agree with the one-shot sketch bit-for-bit
    assert(viaIncrements == whole)
    // 40 + 17 + 2 distinct tokens; HLL at lgK=12 is exact-ish here
    assert(math.abs(viaIncrements - 59) <= 2)
    // strict mode: mixed-lgK increments raise instead of degrading
    val coarse = CorpusStats.vocabSketch(docs, "text", lgK = 8)
    intercept[Exception] {
      CorpusStats.vocabUnionEstimate(a.unionByName(coarse))
    }
  }
}
