package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.tokenize

/** Text-analysis primitives for training-data pipelines: language id,
  * quality scoring, fingerprinting. All pure Column compositions of
  * codegen'd built-ins — no UDFs, no shuffles; they run map-side at
  * any scale.
  */
object TextAnalysis {

  /** Small marker-word lists (top function words) per language. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "que", "y", "en", "los", "se", "del", "las", "por"),
    "fr" -> Seq("le", "les", "et", "un", "une", "des", "est", "dans", "pour", "que"))

  /** Heuristic language id from function-word hits (distinct-token
    * intersection); deterministic tie-break in `markers` order;
    * "unknown" when nothing matches. Native single-pass expression —
    * the declarative fold it replaced ([[languageIdDeclarative]]) kept
    * the tokenize+intersect subtree once per fold branch and measured
    * ~20× slower. */
  def languageId(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftSqlShim.column(
      graft.functions.LanguageIdExpr(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(text), markers))

  /** The original Column-fold formulation — retained ONLY as the
    * parity oracle for [[languageId]] (NativeTextParitySpec). */
  private[graft] def languageIdDeclarative(text: Column): Column = {
    val toks = array_distinct(tokenize(text))
    val scores = markers.map { case (lang, words) =>
      lang -> size(array_intersect(toks, lit(words.toArray)))
    }
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("s"), lit(scores.head._1).as("l"))) {
      case (acc, (lang, s)) =>
        when(s > acc.getField("s"), struct(s.as("s"), lit(lang).as("l")))
          .otherwise(acc)
    }
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("unknown"))
  }

  /** Composite quality score in [0,1]:
    *   0.4·stopword-token ratio + 0.3·min(n_tokens/20, 1)
    *   + 0.3·min(mean_token_len/8, 1)
    * (components inspired by common LLM-data quality filters).
    * One native single-pass expression — the equivalent higher-order
    * composition is CodegenFallback and re-tokenizes per reference. */
  def qualityScore(
      text: Column,
      stopwords: Seq[String] = PorterStemmer.defaultStopwords.toSeq): Column =
    org.apache.spark.sql.graftshim.GraftSqlShim.column(
      graft.functions.QualityScoreExpr(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(text), stopwords))

  /** 64-bit content fingerprint over the normalized token sequence
    * (order-sensitive — exact-dedup key robust to whitespace/punct). */
  def docFingerprint(text: Column): Column = xxhash64(tokenize(text))

  /** SQL-reproducible fingerprint variant: a 31-bit polynomial fold
    * over the per-token [[graft.functions.polyhash31]] hashes — same
    * order-sensitive semantics as [[docFingerprint]], but replayable
    * verbatim by an ANSI-SQL oracle (xxhash64 is not). Native
    * single-pass expression. */
  def docFingerprintSql(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftSqlShim.column(
      graft.functions.PolyDocFingerprint(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(text), 31))

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003): hash
    * every k-gram of the token stream, slide a window of `w` hashes,
    * keep each window's minimum — the classic rolling-hash fingerprint
    * set for local near-dup/overlap detection. Pure Column composition
    * (map-side, codegen'd built-ins); returns a sorted distinct
    * array<bigint>.
    */
  def winnowFingerprints(text: Column, k: Int = 3, w: Int = 4): Column = {
    require(k >= 1 && w >= 1, "graft: winnowing needs k >= 1 and w >= 1")
    org.apache.spark.sql.graftshim.GraftSqlShim.column(
      graft.functions.WinnowExpr(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(text), k, w, 0))
  }

  /** SQL-reproducible winnowing variant: k-grams hashed with
    * [[graft.functions.polyhash31]] instead of xxhash64, so an
    * ANSI-SQL oracle can replay the whole pipeline. */
  def winnowFingerprintsSql(
      text: Column, k: Int = 3, w: Int = 4, mult: Int = 31): Column = {
    require(k >= 1 && w >= 1 && mult > 0,
      "graft: winnowing needs k >= 1, w >= 1, mult > 0")
    org.apache.spark.sql.graftshim.GraftSqlShim.column(
      graft.functions.WinnowExpr(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(text), k, w, mult))
  }

  /** Estimated containment/overlap of two winnowing fingerprint sets
    * (jaccard over the fingerprint sets — one shared implementation). */
  def fingerprintOverlap(a: Column, b: Column): Column =
    graft.ops.Dedup.jaccard(a, b)

  // ------------------------------------------------ repetition signals
  // Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
  // Models: Methods, Analysis & Insights from Training Gopher", §A1.1):
  // highly repetitious documents are low-quality training data. All
  // pure Column compositions — map-side at any scale. Per-doc cost of
  // the mode computations is O(distinct·n) on arrays of ~10² elements.

  /** All four repetition signals as ONE single-pass struct column:
    * (top_ngram, dup_ngram, max_token, dup_line). Prefer this in
    * multi-signal projections — each signal column below evaluates the
    * full pass per reference. */
  def repetitionStats(text: Column, topN: Int = 2, dupN: Int = 3): Column =
    org.apache.spark.sql.graftshim.GraftSqlShim.column(
      graft.functions.RepetitionStats(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(text), topN, dupN))

  /** Fraction of n-gram instances claimed by the single most frequent
    * n-gram (Gopher's "fraction of characters in most common n-gram"
    * simplified to token counts); 0 for docs with no n-grams. */
  def topNgramFraction(text: Column, n: Int): Column =
    repetitionStats(text, topN = n, dupN = n).getField("top_ngram")

  /** Fraction of n-gram instances that are repeats of an earlier one:
    * (count − distinct count) / count; 0 when no n-grams. */
  def dupNgramFraction(text: Column, n: Int): Column =
    repetitionStats(text, topN = n, dupN = n).getField("dup_ngram")

  /** Fraction of tokens claimed by the single most frequent token. */
  def maxTokenFraction(text: Column): Column =
    repetitionStats(text).getField("max_token")

  /** Fraction of non-empty lines that duplicate an earlier line —
    * Gopher's duplicate-line filter; 0 for single-line/empty docs. */
  def dupLineFraction(text: Column): Column =
    repetitionStats(text).getField("dup_line")

  /** Gopher-rule composite document gate (Rae et al. 2021, A1.1): the
    * standard pre-training keep/reject decision with the FIRST failing
    * rule as the reject reason. Rules, in precedence order:
    * word count ∈ [minWords, maxWords]; mean word length ∈ [3, 10];
    * ≥ 2 stopwords; ≥ 80% of words contain a letter; duplicate-line
    * fraction ≤ 0.3; top-2-gram fraction ≤ 0.2; max-token fraction
    * ≤ 0.2.
    *
    * Returns struct(n_words, keep, reason). Pure Column composition
    * over codegen'd built-ins + the native [[repetitionStats]] — one
    * map-side projection, no shuffle; repeated subtrees (toks, the
    * when-chain) collapse under whole-stage-codegen subexpression
    * elimination. Production Gopher uses minWords = 50; callers tune
    * per corpus. */
  def gopherFilter(
      text: Column,
      minWords: Int = 50,
      maxWords: Int = 100000,
      stopwords: Seq[String] =
        Seq("the", "and", "of", "to", "a", "in", "is", "it")): Column = {
    // one native pass for the token signals (measured ~6× over the
    // tokenize+aggregate+filter×2 HOF composition it replaced — the
    // per-token regex matcher dominated), one for the repetition
    // fractions
    val g = org.apache.spark.sql.graftshim.GraftSqlShim.column(
      graft.functions.GopherStatsExpr(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(text),
        stopwords))
    val nw = g.getField("n_words")
    val mwl = when(nw > 0,
      g.getField("len_sum").cast("double") / nw).otherwise(lit(0.0))
    val nstop = g.getField("n_stop")
    val alphaFrac = when(nw > 0,
      g.getField("n_alpha").cast("double") / nw).otherwise(lit(1.0))
    val rep = repetitionStats(text, topN = 2, dupN = 3)
    val reason = when(nw < minWords, "too_few_words")
      .when(nw > maxWords, "too_many_words")
      .when(mwl < 3.0 || mwl > 10.0, "mean_word_length")
      .when(nstop < 2, "too_few_stopwords")
      .when(alphaFrac < 0.8, "non_alpha_words")
      .when(rep.getField("dup_line") > 0.3, "repeated_lines")
      .when(rep.getField("top_ngram") > 0.2, "top_2gram")
      .when(rep.getField("max_token") > 0.2, "max_token")
      .otherwise("ok")
    struct(nw.cast("int").as("n_words"),
      (reason === "ok").as("keep"), reason.as("reason"))
  }

  /** Punctuation-character ratio (quality signal: spammy/tabular text
    * skews high): non-word, non-space chars / all chars. Native
    * single-pass expression; the regex form it replaced is its parity
    * oracle in NativeTextParitySpec. */
  def punctRatio(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftSqlShim.column(
      graft.functions.PunctRatioExpr(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(text)))

  /** The regex formulation — retained ONLY as [[punctRatio]]'s parity
    * oracle. */
  private[graft] def punctRatioDeclarative(text: Column): Column = {
    val n = length(text).cast("double")
    when(n === 0, 0.0).otherwise(
      length(regexp_replace(text, "[\\w\\s]", "")).cast("double") / n)
  }

  /** Deflate compression ratio — the gzip-ratio quality filter of the
    * Dolma/RefinedWeb pipelines: repetitive or templated text
    * compresses far below ~0.4; near-random text sits near 1.0. One
    * native codegen'd pass; see
    * [[graft.functions.DeflateRatioExpr]]. */
  def compressionRatio(text: Column, level: Int = 6): Column =
    org.apache.spark.sql.graftshim.GraftSqlShim.column(
      graft.functions.DeflateRatioExpr(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(text), level))

  /** PII detection/redaction for training corpora (emails, IPv4
    * addresses, international-format phone numbers) — the standard
    * pre-training scrub step (e.g. the C4/Dolma pipelines); not in the
    * reference engine, part of the pipeline surface. Patterns are
    * deliberately restricted to syntax with identical semantics in
    * Java regex and RE2 (no backreferences, no lookaround, ASCII
    * classes only) so results are engine-portable and the driver gate
    * can replay them in DuckDB verbatim.
    *
    * All pure `regexp_*` built-ins: codegen'd, map-side, pattern
    * compiled once per task — runs at any scale with no shuffle.
    */
  object Pii {
    val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val Ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val Phone = "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{3,4}\\b"

    /** All three patterns with their redaction tokens, in the order
      * [[scrub]] applies them. */
    val all: Seq[(String, String, String)] = Seq(
      ("emails", Email, "<EMAIL>"),
      ("ipv4", Ipv4, "<IP>"),
      ("phones", Phone, "<PHONE>"))
  }

  /** Match count per PII category, on the ORIGINAL text independently
    * (an IPv4 mail host inside an email counts in both — categories
    * are independent detectors, not a partition). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    Pii.all.map { case (cat, pat, _) =>
      s"n_$cat" -> size(regexp_extract_all(text, lit(pat), lit(0)))
    }

  /** Text with every PII match replaced by its category token, applied
    * email → IP → phone (an IP inside an already-redacted email is
    * gone with the email). */
  def piiScrub(text: Column): Column =
    Pii.all.foldLeft(text) { case (acc, (_, pat, token)) =>
      regexp_replace(acc, pat, token)
    }
}
