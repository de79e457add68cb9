package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TextPrep

/** Driver-checkable queries for the RAG/training document-prep surface
  * ([[graft.ops.TextPrep]]): token-window chunking, unicode cleanup,
  * sentence splitting. The cleanup and sentence gates use MIRRORED
  * INJECTION (like `pii_scrub`): the corpus is ASCII-clean and
  * single-sentence, so both engines append the same dirty /
  * multi-sentence literal before transforming — every rule is
  * exercised and the oracle stays an exact replay. */
object TextPrepQueries {

  private val MaxTokens = 64
  private val Overlap = 16

  private def chunkDocuments(s: SparkSession, dir: String): DataFrame =
    TextPrep.chunkByTokens(
      Tables.documents(s, dir).where(col("text").isNotNull),
      "doc_id", "text", MaxTokens, Overlap)
      .orderBy("doc_id", "chunk_id")

  private val chunkOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
       |  FROM documents WHERE text IS NOT NULL
       |),
       |c AS (SELECT doc_id, CAST(len(tk) AS INT) AS n, tk FROM t WHERE len(tk) > 0),
       |e AS (
       |  SELECT doc_id, tk, n, CAST(r.i AS INT) AS chunk_id
       |  FROM c, unnest(range(0, CASE WHEN n <= $MaxTokens THEN 1
       |    ELSE 1 + CAST(ceil((n - $MaxTokens) / ${MaxTokens - Overlap}.0) AS INT) END)) AS r(i)
       |)
       |SELECT doc_id, chunk_id,
       |  CAST(least($MaxTokens, n - chunk_id * ${MaxTokens - Overlap}) AS INT) AS n_tokens,
       |  array_to_string(list_slice(tk, chunk_id * ${MaxTokens - Overlap} + 1,
       |    least(chunk_id * ${MaxTokens - Overlap} + $MaxTokens, n)), ' ') AS chunk_text
       |FROM e ORDER BY doc_id, chunk_id""".stripMargin

  /** Dirty suffix: combining-acute e (NFC-composes), ZWSP, NBSP, BEL,
    * C1 control 0x85 — written as code points on both sides. */
  private val DirtySuffix =
    " caf" + "e\u0301" + "\u200B" + " end" + "\u00A0" + "x" + "\u0007" + "y" + "\u0085" + "z"
  private val DirtySuffixSql =
    "' caf' || 'e' || chr(769) || chr(8203) || ' end' || chr(160) || 'x' || chr(7) || 'y' || chr(133) || 'z'"

  private def unicodeClean(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        TextPrep.cleanText(concat(col("text"), lit(DirtySuffix)))
          .as("text_clean"))
      .orderBy("doc_id")

  private val cleanOracle: String =
    s"""SELECT doc_id,
       |  regexp_replace(
       |    regexp_replace(
       |      regexp_replace(nfc_normalize(text || $DirtySuffixSql),
       |        '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]', '', 'g'),
       |      '[\\x{00A0}]', ' ', 'g'),
       |    '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x{80}-\\x{9F}]', '', 'g') AS text_clean
       |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin

  private val SentenceSuffix =
    ". Dr. Smith arrived! Did he? Yes... the end"

  private def sentenceSplit(s: SparkSession, dir: String): DataFrame =
    TextPrep.sentenceSplit(
      Tables.documents(s, dir)
        .where(col("text").isNotNull)
        .select(col("doc_id"),
          concat(col("text"), lit(SentenceSuffix)).as("text")),
      "doc_id", "text")
      .orderBy("doc_id", "sent_id")

  private val sentenceOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(list_transform(
       |    regexp_extract_all(text || '$SentenceSuffix', '[^.!?]+[.!?]+|[^.!?]+$$'),
       |    x -> trim(x)), x -> x <> '') AS ss
       |  FROM documents WHERE text IS NOT NULL
       |)
       |SELECT doc_id, CAST(r.i AS INT) - 1 AS sent_id, ss[CAST(r.i AS INT)] AS sentence
       |FROM t, unnest(range(1, len(ss) + 1)) AS r(i)
       |ORDER BY doc_id, sent_id""".stripMargin

  /** Consecutive-duplicate-line collapse; the single-line corpus is
    * restructured into lines (token-per-line) plus an appended known
    * duplicate block, identically on both sides. */
  private def collapseLines(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextPrep.collapseRepeatedLines(
      Tables.documents(s, dir)
        .where(col("text").isNotNull)
        .select(col("doc_id"),
          concat(regexp_replace(col("text"), " ", "\n"),
            lit("\nzz\nzz\nzz\nyy\nyy")).as("text")),
      "doc_id", "text")
      .orderBy("doc_id")

  private val collapseOracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(text, ' ', chr(10), 'g')
      |      || chr(10) || 'zz' || chr(10) || 'zz' || chr(10) || 'zz'
      |      || chr(10) || 'yy' || chr(10) || 'yy', chr(10)) AS ls
      |  FROM documents WHERE text IS NOT NULL
      |)
      |SELECT doc_id,
      |  array_to_string(list_filter(ls, (x, i) -> i = 1 OR x <> ls[i - 1]),
      |    chr(10)) AS text_clean
      |FROM t ORDER BY doc_id""".stripMargin

  // ------------------------------------- language segmentation

  /** Appended multi-language block: one French and one German sentence
    * of marker words DISJOINT from every other language's list, so the
    * injected segments label deterministically. */
  private val LangSuffix =
    ". les et une des dans pour! der und das nicht mit zu?"

  /** Per-SENTENCE language segmentation rolled up per doc — the
    * mixed-language-document profile (code-switching detection, per-
    * segment routing to language-specific pipelines): sentence split →
    * marker language id per sentence → dominant language, segment and
    * language counts, minority fraction. The corpus is single-language
    * per doc, so the mirrored injection adds known fr+de segments to
    * every doc. One doc_id Exchange carries both windows. */
  private def langSegments(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sents = TextPrep.sentenceSplit(
      Tables.documents(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"), concat(col("text"), lit(LangSuffix)).as("text")),
      "doc_id", "text")
      .select(col("doc_id"),
        graft.text.TextAnalysis.languageId(col("sentence")).as("slang"))
    val counts = sents.groupBy("doc_id", "slang").agg(count(lit(1)).as("cnt"))
    val doc = Window.partitionBy("doc_id")
    val byCnt = doc.orderBy(col("cnt").desc, col("slang"))
    counts
      .withColumn("rn", row_number().over(byCnt))
      .withColumn("total", sum("cnt").over(doc))
      .withColumn("nl", count(lit(1)).over(doc))
      .where(col("rn") === 1)
      .select(col("doc_id"),
        col("slang").as("dominant_lang"),
        col("nl").cast("int").as("n_langs"),
        col("total").cast("int").as("n_segments"),
        (floor((lit(1.0) - col("cnt").cast("double") / col("total")) * 1e4
          + 0.5) / 1e4).as("minority_frac"))
      .orderBy("doc_id")
  }

  private val langSegmentsOracle: String = {
    val toks =
      "list_distinct(list_filter(string_split_regex(lower(sentence), '[^a-z0-9]+'), x -> x <> ''))"
    val scores = graft.text.TextAnalysis.markers.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_intersect($toks, $list)) AS s_$lang"
    }.mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(list_transform(
       |    regexp_extract_all(text || '$LangSuffix', '[^.!?]+[.!?]+|[^.!?]+$$'),
       |    x -> trim(x)), x -> x <> '') AS ss
       |  FROM documents WHERE text IS NOT NULL
       |), se AS (
       |  SELECT doc_id, unnest(ss) AS sentence FROM t
       |), scored AS (
       |  SELECT doc_id, $scores FROM se
       |), lab AS (
       |  SELECT doc_id,
       |    CASE
       |      WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'unknown'
       |      WHEN s_fr > s_es AND s_fr > s_de AND s_fr > s_en THEN 'fr'
       |      WHEN s_es > s_de AND s_es > s_en THEN 'es'
       |      WHEN s_de > s_en THEN 'de'
       |      ELSE 'en'
       |    END AS slang
       |  FROM scored
       |), c AS (
       |  SELECT doc_id, slang, count(*) AS cnt FROM lab GROUP BY doc_id, slang
       |), agg AS (
       |  SELECT doc_id, slang, cnt,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, slang) AS rn,
       |    sum(cnt) OVER (PARTITION BY doc_id) AS total,
       |    count(*) OVER (PARTITION BY doc_id) AS nl
       |  FROM c
       |)
       |SELECT doc_id, slang AS dominant_lang, CAST(nl AS INT) AS n_langs,
       |  CAST(total AS INT) AS n_segments,
       |  floor((1.0 - cnt * 1.0 / total) * 1e4 + 0.5) / 1e4 AS minority_frac
       |FROM agg WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  def all: Seq[QueryDef] = Seq(
    QueryDef("chunk_documents", Some(chunkOracle), chunkDocuments),
    QueryDef("unicode_clean", Some(cleanOracle), unicodeClean),
    QueryDef("sentence_split", Some(sentenceOracle), sentenceSplit),
    QueryDef("collapse_lines", Some(collapseOracle), collapseLines),
    QueryDef("lang_segments", Some(langSegmentsOracle), langSegments),
  )
}
