package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.text.TextAnalysis

/** The native single-pass text expressions exist only for performance —
  * each must be value-identical to the higher-order-function
  * composition it replaced, on arbitrary input (unicode, punctuation
  * runs, empties, repeats).
  */
class NativeTextParitySpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813)
  private val words =
    Seq("the", "quick", "brown", "fox", "dog", "Alpha", "beta2", "C3PO",
      "naïve", "Über", "word", "x")
  private def randText(): String = {
    val n = rnd.nextInt(30)
    (0 until n).map { _ =>
      val w = words(rnd.nextInt(words.size))
      val sep = Seq(" ", "  ", ", ", "!", "\n", " - ")(rnd.nextInt(6))
      w + sep
    }.mkString
  }
  private lazy val docs =
    ((0 until 200).map(i => (i.toLong, randText())) ++ Seq(
      (900L, ""), (901L, "   "), (902L, "!!!"), (903L, "a"),
      (904L, "a a a a a a"), (905L, "x\nx\nx\ny\n\n"),
      (906L, "naïve Über naïve Über naïve Über")))
      .toDF("id", "text").localCheckpoint()

  test("TokenizeExpr == regex tokenizer") {
    val regexForm = {
      val c = $"text"
      filter(
        split(regexp_replace(lower(c), "[^\\p{L}\\p{N}]+", " "), " "),
        t => length(t) > 0)
    }
    val rows = docs.select($"id", tokenize($"text").as("n"), regexForm.as("e"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"id ${r.getLong(0)}")
    }
  }

  test("StemTokensExpr == transform/filter stem composition") {
    val sw = graft.text.PorterStemmer.defaultStopwords.toSeq
    val hof = {
      val stemmed = transform(tokenize($"text"), t => stem_word(t))
      filter(stemmed, t => !array_contains(lit(sw), t))
    }
    val rows = docs.select($"id",
      text_to_stem_array($"text").as("n"), hof.as("e")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"id ${r.getLong(0)}")
    }
  }

  test("SortedTokenHashes == sort_array(array_distinct(transform(xxhash64)))") {
    val toksCol = tokenize($"text")
    val native = org.apache.spark.sql.graftshim.GraftSqlShim.column(
      graft.ops.SortedTokenHashes(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(toksCol)))
    val hof = sort_array(array_distinct(transform(toksCol, t => xxhash64(t))))
    val rows = docs.select($"id", native.as("n"), hof.as("e")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id ${r.getLong(0)}")
    }
  }

  test("WordShingles == shingles(tokenize(text))") {
    val native = docs.select($"id",
      org.apache.spark.sql.graftshim.GraftSqlShim.column(
        WordShingles(org.apache.spark.sql.graftshim.GraftSqlShim.expression($"text"), 3))
        .as("sh"))
    val hof = docs.select($"id",
      graft.ops.Dedup.shingles(tokenize($"text"), 3).as("sh"))
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val h = hof.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(n == h)
  }

  test("RepetitionStats == higher-order repetition fractions") {
    def hofTop(text: org.apache.spark.sql.Column, n: Int) = {
      val grams = graft.ops.Dedup.shingles(tokenize(text), n)
      val m = size(grams)
      when(m === 0, lit(0.0)).otherwise(
        array_max(transform(array_distinct(grams), g =>
          size(filter(grams, x => x === g)))).cast("double") / m.cast("double"))
    }
    def hofDup(text: org.apache.spark.sql.Column, n: Int) = {
      val grams = graft.ops.Dedup.shingles(tokenize(text), n)
      val m = size(grams)
      when(m === 0, lit(0.0)).otherwise(
        (m - size(array_distinct(grams))).cast("double") / m.cast("double"))
    }
    def hofMaxTok(text: org.apache.spark.sql.Column) = {
      val toks = tokenize(text)
      val m = size(toks)
      when(m === 0, lit(0.0)).otherwise(
        array_max(transform(array_distinct(toks), t =>
          size(filter(toks, x => x === t)))).cast("double") / m.cast("double"))
    }
    def hofDupLine(text: org.apache.spark.sql.Column) = {
      val lines = filter(split(text, "\n"), l => length(l) > 0)
      val m = size(lines)
      when(m === 0, lit(0.0)).otherwise(
        (m - size(array_distinct(lines))).cast("double") / m.cast("double"))
    }
    val rows = docs.select($"id",
      TextAnalysis.topNgramFraction($"text", 2).as("a"),
      hofTop($"text", 2).as("ea"),
      TextAnalysis.dupNgramFraction($"text", 3).as("b"),
      hofDup($"text", 3).as("eb"),
      TextAnalysis.maxTokenFraction($"text").as("c"),
      hofMaxTok($"text").as("ec"),
      TextAnalysis.dupLineFraction($"text").as("d"),
      hofDupLine($"text").as("ed")).collect()
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"top: ${r.getLong(0)}")
      assert(r.getDouble(3) == r.getDouble(4), s"dup: ${r.getLong(0)}")
      assert(r.getDouble(5) == r.getDouble(6), s"maxtok: ${r.getLong(0)}")
      assert(r.getDouble(7) == r.getDouble(8), s"dupline: ${r.getLong(0)}")
    }
  }

  test("QualityScoreExpr == higher-order quality score") {
    def hof(text: org.apache.spark.sql.Column) = {
      val toks = tokenize(text)
      val n = size(toks).cast("double")
      val stops = lit(graft.text.PorterStemmer.defaultStopwords)
      val stopRatio = when(n === 0, 0.0).otherwise(
        size(filter(toks, t => array_contains(stops, t))).cast("double") / n)
      val lenScore = least(n / 20.0, lit(1.0))
      val meanLen = when(n === 0, 0.0).otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / n)
      val meanLenScore = least(meanLen / 8.0, lit(1.0))
      lit(0.4) * stopRatio + lit(0.3) * lenScore + lit(0.3) * meanLenScore
    }
    val rows = docs.select(
      TextAnalysis.qualityScore($"text").as("a"), hof($"text").as("e"), $"id")
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12, s"id ${r.getLong(2)}")
    }
  }

  test("GopherStatsExpr == tokenize + aggregate + filter composition") {
    val stops = Seq("the", "and", "of", "to", "a", "in", "is", "it")
    def hof(text: org.apache.spark.sql.Column) = {
      val toks = tokenize(text)
      struct(
        size(toks).as("n_words"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("len_sum"),
        size(filter(toks, t => t.isInCollection(stops))).as("n_stop"),
        size(filter(toks, t => t.rlike("[a-z]"))).as("n_alpha"))
    }
    val native = org.apache.spark.sql.graftshim.GraftSqlShim.column(
      GopherStatsExpr(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression($"text"), stops))
    val rows = docs.select(native.as("a"), hof($"text").as("e"), $"id").collect()
    rows.foreach { r =>
      assert(r.getStruct(0).toSeq == r.getStruct(1).toSeq, s"id ${r.getLong(2)}")
    }
  }

  test("WinnowExpr(xxhash64) == higher-order winnowing") {
    def hof(text: org.apache.spark.sql.Column, k: Int, w: Int) = {
      val toks = tokenize(text)
      val grams = when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k), i =>
          xxhash64(concat_ws(" ", slice(toks, i + lit(1), lit(k))))))
        .otherwise(array().cast("array<bigint>"))
      val mins = when(size(grams) >= w,
        transform(sequence(lit(0), size(grams) - w), i =>
          array_min(slice(grams, i + lit(1), lit(w)))))
        .otherwise(when(size(grams) > 0, array(array_min(grams)))
          .otherwise(array().cast("array<bigint>")))
      sort_array(array_distinct(mins))
    }
    val rows = docs.select($"id",
      TextAnalysis.winnowFingerprints($"text").as("n"),
      hof($"text", 3, 4).as("e")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id ${r.getLong(0)}")
    }
  }

  test("LanguageIdExpr == declarative when/struct fold") {
    // marker-dense rows exercise every branch: clear winners per
    // language, the es/fr-shared "que", exact ties (first wins),
    // repeated markers (distinct-token semantics), zero hits.
    val langDocs = (docs.collect().map(r => (r.getLong(0), r.getString(1))) ++ Seq(
      (950L, "the cat and the dog is of to in that"),
      (951L, "der hund und die katze ist nicht mit ein zu"),
      (952L, "el perro y la casa que en los se del"),
      (953L, "le chien et les chats dans une pour est"),
      (954L, "que"), // es and fr both score 1 → es (earlier in markers)
      (955L, "the der"), // en/de tie → en
      (956L, "the the the the der die und"), // repeats: distinct counts
      (957L, "zzz qqq 123"),
      (958L, "QUE Le LES et"), // case-folding
      (959L, "y en que le les et un"))).toSeq
      .toDF("id", "text")
    val rows = langDocs.select($"id",
      TextAnalysis.languageId($"text").as("n"),
      TextAnalysis.languageIdDeclarative($"text").as("e")).collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2), s"id ${r.getLong(0)}")
    }
  }

  test("PunctRatioExpr == regex punct ratio") {
    val extra = (docs.collect().map(r => (r.getLong(0), r.getString(1))) ++ Seq(
      (970L, "a_b_c!!!"), (971L, "\t\n\f\r "), (972L, "¡¿§±—…"),
      (973L, "𝒜!𝒜"), (974L, "half‐width ｆｕｌｌ"))).toSeq
      .toDF("id", "text")
    val rows = extra.select($"id",
      TextAnalysis.punctRatio($"text").as("n"),
      TextAnalysis.punctRatioDeclarative($"text").as("e")).collect()
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"id ${r.getLong(0)}")
    }
  }

  test("case-folding canon: supplementary planes match, İ diverges by design") {
    // Supplementary-plane letters (U+1D49C script-A): per-code-point
    // lowercase and full-string lowercase agree, and quality_score's
    // mean token length counts CODE POINTS (not UTF-16 units) — both
    // must be value-identical to the declarative forms.
    val supp = Seq((0L, "𝒜𝒜 hello wörld"))
      .toDF("id", "text")
    val suppRows = supp.select(
      tokenize($"text").as("n"),
      filter(split(regexp_replace(lower($"text"), "[^\\p{L}\\p{N}]+", " "), " "),
        t => length(t) > 0).as("e"),
      TextAnalysis.qualityScore($"text").as("nq")).head()
    assert(suppRows.getSeq[String](0) == suppRows.getSeq[String](1))
    // mean token len = (2 + 5 + 5)/3 per code points; UTF-16 counting
    // would have seen (4 + 5 + 5)/3
    val expectedQ = 0.4 * 0.0 + 0.3 * math.min(3 / 20.0, 1.0) +
      0.3 * math.min((12.0 / 3) / 8.0, 1.0)
    assert(math.abs(suppRows.getDouble(2) - expectedQ) < 1e-12)

    // U+0130 'İ': full-string lowercase EXPANDS to i + combining dot
    // (which then splits the token); the native per-code-point fold
    // yields plain "ix". The native form is canonical — this pin makes
    // the deviation explicit rather than accidental.
    val turk = Seq((0L, "İx")).toDF("id", "text")
    val t = turk.select(
      tokenize($"text").as("n"),
      filter(split(regexp_replace(lower($"text"), "[^\\p{L}\\p{N}]+", " "), " "),
        t => length(t) > 0).as("e")).head()
    assert(t.getSeq[String](0) == Seq("ix"))
    assert(t.getSeq[String](1) == Seq("i", "x"))
  }

  test("PolyDocFingerprint == higher-order polynomial fold") {
    val hof = aggregate(
      transform(tokenize($"text"), t => polyhash31(t)),
      lit(0L), (acc, x) => (acc * 31 + x) % lit(2147483647L))
    val rows = docs.select($"id",
      TextAnalysis.docFingerprintSql($"text").as("n"), hof.as("e")).collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id ${r.getLong(0)}"))
  }
}
