package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Dsir

/** Driver-checkable queries for the data-selection surface
  * ([[graft.ops.Dsir]] — DSIR importance weighting, Xie et al.
  * NeurIPS 2023). The whole pipeline (tokenize → uni+bigram →
  * polyhash31 bucket → add-α fit → per-doc log-weight) replays
  * exactly in the DuckDB oracle. */
object SelectionQueries {

  private val Buckets = 4096
  private val Alpha = 0.5

  /** Per-doc DSIR log importance weight against an English-target fit
    * over the whole corpus: `(doc_id, logw)`, all non-null-text docs. */
  private def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val lambda = Dsir.fit(
      docs.where(col("lang") === "en"), docs, "text", Buckets, Alpha)
    Dsir.logWeights(docs, "doc_id", "text", lambda, Buckets)
      .select(col("doc_id"), round(col("logw"), 4).as("logw"))
      .orderBy("doc_id")
  }

  /** Top-50 selection by ROUNDED weight (desc, doc_id asc — a
    * deterministic tie-break both engines replay bit-identically). */
  private def dsirSelect(s: SparkSession, dir: String): DataFrame =
    dsirWeights(s, dir)
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(50)

  /** Shared oracle prefix: hashed-gram buckets + fitted per-bucket
    * log-ratios + per-doc sums, in pure ANSI SQL. */
  private val oraclePrefix: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk
       |  FROM documents WHERE text IS NOT NULL
       |),
       |grams AS (
       |  SELECT doc_id, lang, u.g AS gram FROM toks, unnest(tk) AS u(g)
       |  UNION ALL
       |  SELECT doc_id, lang, tk[CAST(r.i AS INT)] || ' ' || tk[CAST(r.i AS INT) + 1] AS gram
       |  FROM toks, unnest(range(1, len(tk))) AS r(i)
       |),
       |b AS (
       |  SELECT doc_id, lang,
       |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
       |       list_transform(range(1, length(gram) + 1), j -> ascii(gram[CAST(j AS INT)]))),
       |       (a, c) -> (a * 31 + c) % 2147483647) % $Buckets) AS bucket
       |  FROM grams
       |),
       |tgt AS (SELECT bucket, count(*) AS c FROM b WHERE lang = 'en' GROUP BY bucket),
       |raw AS (SELECT bucket, count(*) AS c FROM b GROUP BY bucket),
       |tot AS (SELECT (SELECT sum(c) FROM tgt) AS tt, (SELECT sum(c) FROM raw) AS tr),
       |lam AS (
       |  SELECT r.bucket,
       |    ln((coalesce(t.c, 0) + $Alpha) / (tot.tt + $Alpha * $Buckets))
       |      - ln((r.c + $Alpha) / (tot.tr + $Alpha * $Buckets)) AS lam
       |  FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN tot
       |),
       |score AS (
       |  SELECT b.doc_id, sum(lam.lam) AS logw
       |  FROM b JOIN lam USING (bucket) GROUP BY b.doc_id
       |),
       |w AS (
       |  SELECT d.doc_id, round(coalesce(score.logw, 0.0), 4) AS logw
       |  FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
       |  LEFT JOIN score USING (doc_id)
       |)""".stripMargin

  private val weightsOracle: String =
    s"""$oraclePrefix
       |SELECT doc_id, logw FROM w ORDER BY doc_id""".stripMargin

  private val selectOracle: String =
    s"""$oraclePrefix
       |SELECT doc_id, logw FROM w ORDER BY logw DESC, doc_id LIMIT 50""".stripMargin

  /** Closed-form NB language classifier: fit on the corpus's own lang
    * labels, predict every doc — `(doc_id, pred, score)`. */
  private def nbClassify(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val model = graft.ops.NbClassifier.fit(docs, "lang", "text", Buckets, Alpha)
    graft.ops.NbClassifier.predict(docs, "doc_id", "text", model)
      .select(col("doc_id"), col("pred"), round(col("score"), 4).as("score"))
      .orderBy("doc_id")
  }

  private val nbOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk
       |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
       |),
       |grams AS (
       |  SELECT doc_id, lang, u.g AS gram FROM toks, unnest(tk) AS u(g)
       |  UNION ALL
       |  SELECT doc_id, lang, tk[CAST(r.i AS INT)] || ' ' || tk[CAST(r.i AS INT) + 1] AS gram
       |  FROM toks, unnest(range(1, len(tk))) AS r(i)
       |),
       |b AS (
       |  SELECT doc_id, lang,
       |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
       |       list_transform(range(1, length(gram) + 1), j -> ascii(gram[CAST(j AS INT)]))),
       |       (a, c) -> (a * 31 + c) % 2147483647) % $Buckets) AS bucket
       |  FROM grams
       |),
       |prior AS (SELECT lang, count(*) AS nd FROM documents
       |          WHERE text IS NOT NULL AND lang IS NOT NULL GROUP BY lang),
       |tot AS (SELECT sum(nd) AS n FROM prior),
       |cc AS (SELECT lang, bucket, count(*) AS c FROM b GROUP BY lang, bucket),
       |ctot AS (SELECT lang, sum(c) AS t FROM cc GROUP BY lang),
       |gs AS (
       |  SELECT b.doc_id, ctot.lang,
       |    sum(ln((coalesce(cc.c, 0) + $Alpha) / (ctot.t + $Alpha * $Buckets))) AS s
       |  FROM b CROSS JOIN ctot
       |  LEFT JOIN cc ON cc.lang = ctot.lang AND cc.bucket = b.bucket
       |  GROUP BY b.doc_id, ctot.lang
       |),
       |allsc AS (
       |  SELECT d.doc_id, prior.lang,
       |    coalesce(gs.s, 0) + ln(prior.nd * 1.0 / tot.n) AS s
       |  FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
       |  CROSS JOIN prior CROSS JOIN tot
       |  LEFT JOIN gs ON gs.doc_id = d.doc_id AND gs.lang = prior.lang
       |),
       |pick AS (
       |  SELECT doc_id, lang, s,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang) AS rn
       |  FROM allsc
       |)
       |SELECT doc_id, lang AS pred, round(s, 4) AS score
       |FROM pick WHERE rn = 1 ORDER BY doc_id""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef("dsir_weights", Some(weightsOracle), dsirWeights),
    QueryDef("dsir_select", Some(selectOracle), dsirSelect),
    QueryDef("nb_classify", Some(nbOracle), nbClassify),
  )
}
