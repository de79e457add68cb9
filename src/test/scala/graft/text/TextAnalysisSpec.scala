package graft.text

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("winnowing: identical texts share fingerprints, shifted text overlaps, unrelated doesn't") {
    val doc = "the quick brown fox jumps over the lazy dog again and again today"
    val shifted = "PREFIX words here " + doc
    val other = "completely different content about spark query planning internals"
    val df = Seq((1L, doc), (2L, doc), (3L, shifted), (4L, other)).toDF("id", "t")
      .select($"id", TextAnalysis.winnowFingerprints($"t", k = 3, w = 4).as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    assert(fps(1L) === fps(2L), "identical docs → identical fingerprint sets")
    assert(fps(1L).nonEmpty)
    // winnowing guarantees shared fingerprints for long shared substrings
    val shared = fps(1L).toSet.intersect(fps(3L).toSet)
    assert(shared.nonEmpty, "shifted copy must share fingerprints")
    assert(fps(1L).toSet.intersect(fps(4L).toSet).isEmpty,
      "unrelated docs should share nothing here")

    val overlap = Seq((fps(1L), fps(3L))).toDF("a", "b")
      .select(TextAnalysis.fingerprintOverlap($"a", $"b")).head().getDouble(0)
    assert(overlap > 0.5, s"overlap $overlap")
  }

  test("winnowing edge cases: short docs, empty text") {
    val df = Seq((1L, "one two"), (2L, ""), (3L, "a b c d")).toDF("id", "t")
      .select($"id", TextAnalysis.winnowFingerprints($"t", k = 3, w = 4).as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fps(1L).isEmpty, "fewer than k tokens → no fingerprints")
    assert(fps(2L).isEmpty)
    // 4 tokens, k=3 → 2 grams < w → single min
    assert(fps(3L).size === 1)
  }

  test("polyhash31 matches the fold-over-code-points definition") {
    import graft.functions.polyhash31
    def ref(s: String, mult: Int): Long =
      s.codePoints().toArray.foldLeft(0L)((h, cp) => (h * mult + cp) % 2147483647L)
    val inputs = Seq("hello", "a", "", "quick brown fox", "z9 8x")
    val got = inputs.toDF("s")
      .select(polyhash31($"s", 31).as("h31"), polyhash31($"s", 37).as("h37"))
      .collect()
    inputs.zip(got).foreach { case (s, row) =>
      assert(row.getLong(0) == ref(s, 31), s"mult 31 mismatch for '$s'")
      assert(row.getLong(1) == ref(s, 37), s"mult 37 mismatch for '$s'")
    }
  }

  test("docFingerprintSql: equal normalized token streams collide, different don't") {
    val df = Seq(
      (1L, "The quick... brown FOX"),
      (2L, "the quick brown fox"),
      (3L, "the quick brown foxes")).toDF("id", "text")
    val fps = df.select($"id", TextAnalysis.docFingerprintSql($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("winnowFingerprints with polynomial gram hash keeps the overlap property") {
    val doc = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq((1L, doc), (2L, doc), (3L, "totally different words entirely here"))
      .toDF("id", "text")
      .select($"id", TextAnalysis.winnowFingerprintsSql($"text").as("fps"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) == fps(2L) && fps(1L).nonEmpty)
    assert((fps(1L) intersect fps(3L)).isEmpty)
  }

  test("repetition signals: hand-computed fractions") {
    val df = Seq((1L, "a b a b a b"), (2L, "x\nx\ny"), (3L, "")).toDF("id", "text")
    val row = df.where($"id" === 1).select(
      TextAnalysis.topNgramFraction($"text", 2),
      TextAnalysis.dupNgramFraction($"text", 3),
      TextAnalysis.maxTokenFraction($"text"),
      TextAnalysis.dupLineFraction($"text")).head()
    // 2-grams: [a b, b a, a b, b a, a b] → top 3/5; 3-grams: 4 with 2
    // distinct → 2/4; tokens: a appears 3/6; one line → no dup lines
    assert(row.getDouble(0) == 0.6)
    assert(row.getDouble(1) == 0.5)
    assert(row.getDouble(2) == 0.5)
    assert(row.getDouble(3) == 0.0)
    val lines = df.where($"id" === 2)
      .select(TextAnalysis.dupLineFraction($"text")).head().getDouble(0)
    assert(math.abs(lines - 1.0 / 3.0) < 1e-12)
    val empty = df.where($"id" === 3).select(
      TextAnalysis.topNgramFraction($"text", 2),
      TextAnalysis.dupNgramFraction($"text", 3),
      TextAnalysis.maxTokenFraction($"text"),
      TextAnalysis.dupLineFraction($"text")).head()
    (0 until 4).foreach(i => assert(empty.getDouble(i) == 0.0))
  }

  test("punctRatio counts non-word non-space chars") {
    val df = Seq(
      (1L, "abcd"), (2L, "a,b.c!"), (3L, ""), (4L, "!!!!"))
      .toDF("id", "t")
      .select($"id", TextAnalysis.punctRatio($"t").as("r"))
    val rs = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rs(1L) === 0.0)
    assert(rs(2L) === 0.5) // 3 punct / 6 chars
    assert(rs(3L) === 0.0)
    assert(rs(4L) === 1.0)
  }

  test("piiScrub redacts emails, ipv4 and phones; counts are independent") {
    val docs = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org today"),
      (2L, "server 192.168.0.1 and backup 10.0.0.255 up"),
      (3L, "call +44-201-5550 or +1 555 0100 now"),
      (4L, "mixed bob@10.0.0.1 with host"), // no alphabetic TLD → not an email; IP still caught
      (5L, "clean text with no identifiers at all"),
      (6L, "v1.2.3 released, section 1.2 unchanged")) // versions are NOT ipv4 (no 4th octet)
      .toDF("id", "t")
    val out = TextAnalysis.piiCounts($"t")
      .foldLeft(docs) { case (df, (name, c)) => df.withColumn(name, c) }
      .withColumn("red", TextAnalysis.piiScrub($"t"))
      .select("id", "n_emails", "n_ipv4", "n_phones", "red")
      .as[(Long, Int, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1, 0, 0, "mail me at <EMAIL> today")))
    assert(out(2L) == ((2L, 0, 2, 0, "server <IP> and backup <IP> up")))
    assert(out(3L) == ((3L, 0, 0, 2, "call <PHONE> or <PHONE> now")))
    assert(out(4L) == ((4L, 0, 1, 0, "mixed bob@<IP> with host")))
    assert(out(5L) == ((5L, 0, 0, 0, "clean text with no identifiers at all")))
    assert(out(6L) == ((6L, 0, 0, 0, "v1.2.3 released, section 1.2 unchanged")))
  }

  test("gopherFilter: each rule fires with its reason, in precedence order") {
    val keepDoc = ("the quick brown fox jumps over a lazy dog and then " +
      "it runs far into the green field of tall grass to rest a while " +
      "under one old oak tree near the quiet river bank at dusk time")
    val docs = Seq(
      (1L, keepDoc), // passes every rule
      (2L, "short text"), // too_few_words
      (3L, Seq.fill(30)("abcdefghijklmnop").mkString(" ") + " the it"), // mean_word_length (16 > 10)
      (4L, (1 to 30).map(i => s"word$i thing$i stuff$i").mkString(" ")), // too_few_stopwords
      (5L, "the it " + Seq.tabulate(30)(i => s"${i}111 ${i}222 ${i}333").mkString(" ")), // non_alpha_words (digit-only toks)
      (6L, "the green line is it\n" * 40), // repeated_lines (dup frac 39/40)
      (7L, "the it " + Seq.tabulate(20)(i => s"xxxx a${i}b").mkString(" ")), // max_token (xxxx = 20/42, all 2-grams distinct)
      (8L, "the it " + Seq.fill(40)("lala").mkString(" "))) // top_2gram ("lala lala" dominates)
      .toDF("doc_id", "text")
    val out = docs
      .select($"doc_id", TextAnalysis.gopherFilter($"text", minWords = 30).as("g"))
      .select($"doc_id", $"g.keep", $"g.reason")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, true, "ok")))
    assert(out(2L) == ((2L, false, "too_few_words")))
    assert(out(3L) == ((3L, false, "mean_word_length")))
    assert(out(4L) == ((4L, false, "too_few_stopwords")))
    assert(out(5L) == ((5L, false, "non_alpha_words")))
    assert(out(6L) == ((6L, false, "repeated_lines")))
    assert(out(7L) == ((7L, false, "max_token")))
    assert(out(8L) == ((8L, false, "top_2gram")))
  }
}
