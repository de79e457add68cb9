package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.tokenize

/** One-pass corpus profile — the reporting step every training-data
  * pipeline runs before/after filtering (doc counts, token budgets,
  * length distribution, per-language breakdown). Not in the reference
  * engine; part of the pipeline surface.
  *
  * Scale design: a single partial-aggregated `groupBy(lang)` — the map
  * side reduces each partition to one tiny sketch row per language, so
  * the shuffle carries O(languages × partitions) rows regardless of
  * corpus size. Percentiles use Spark's exact `percentile` aggregate
  * (correct at any scale, memory O(distinct lengths) per group — token
  * counts are small integers); swap `percentile_approx` in when
  * distinct-value cardinality is unbounded.
  */
object CorpusStats {

  /** Per-language profile: docs, token totals/mean, exact token-count
    * percentiles (p50/p90/p99), mean doc length in chars. Deterministic
    * row order (by lang) for hashing. */
  def byLanguage(
      df: DataFrame,
      langCol: String,
      textCol: String): DataFrame = {
    val toks = size(tokenize(col(textCol)))
    df.select(col(langCol).as("lang"), toks.as("__n"),
      length(col(textCol)).as("__len"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n")).as("total_tokens"),
        round(avg(col("__n")), 4).as("avg_tokens"),
        percentile(col("__n"), lit(0.5)).as("p50_tokens"),
        percentile(col("__n"), lit(0.9)).as("p90_tokens"),
        percentile(col("__n"), lit(0.99)).as("p99_tokens"),
        round(avg(col("__len")), 4).as("avg_chars"))
      .orderBy(col("lang"))
  }

  /** Whole-corpus totals (one row): the same aggregate without the
    * language key. */
  def overall(df: DataFrame, textCol: String): DataFrame =
    byLanguage(df.withColumn("__all", lit("all")), "__all", textCol)
      .drop("lang")

  /** One-row corpus "data card" — the headline numbers a dataset
    * release documents (counts, language spread, duplication, quality,
    * PII load), all in a handful of partial-aggregated passes over the
    * documents table joined as one-row frames (cross joins of single
    * rows — no data movement beyond the aggregates themselves). */
  def dataCard(df: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    import graft.text.TextAnalysis
    val base = df.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col(langCol)).cast("int").as("n_langs"),
      sum(length(col(textCol))).as("total_chars"))
    val dups = df.where(col(textCol).isNotNull)
      .groupBy(col(textCol)).agg(count(lit(1)).as("c"))
      .agg((sum(col("c")) - count(lit(1))).cast("long").as("n_exact_dups"))
    val quality = df.where(col(textCol).isNotNull)
      .select(floor(TextAnalysis.qualityScore(col(textCol)) * 1e4 + 0.5)
        .cast("long").as("q4"))
      .agg(count(lit(1)).as("nq"), sum(col("q4")).as("sq"))
      .select((col("sq").cast("double") / col("nq") / 1e4).as("avg_q"))
      .select(round(col("avg_q"), 4).as("avg_quality"))
    val pii = df.where(col(textCol).isNotNull)
      .select(TextAnalysis.piiCounts(col(textCol))
        .map(_._2).reduce(_ + _).as("p"))
      .agg(sum(when(col("p") > 0, 1).otherwise(0)).cast("long")
        .as("n_docs_with_pii"))
    base.crossJoin(dups).crossJoin(quality).crossJoin(pii)
  }

  /** Sketch-based profile — the 100 TB path. `countDistinct(token)`
    * shuffles every distinct token to its reducer (the shuffle grows
    * with VOCABULARY, which at web scale is corpus-sized thanks to
    * typos/ids/urls); `approx_count_distinct` reduces each partition
    * to one constant-size HLL++ sketch per language, and
    * `percentile_approx` likewise one quantile sketch — shuffle bytes
    * become O(languages × partitions), independent of corpus size.
    *
    * rsd 0.02 ⇒ ±2% standard error on the distinct count; accuracy
    * 10000 ⇒ ≤ 1e-4 rank error on the percentiles.
    */
  def approxProfile(
      df: DataFrame,
      langCol: String,
      textCol: String,
      rsd: Double = 0.02): DataFrame = {
    val docAgg = df
      .select(col(langCol).as("lang"), length(col(textCol)).as("__len"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        percentile_approx(col("__len"), array(lit(0.5), lit(0.9)),
          lit(10000)).as("__p"))
    val tokAgg = df
      .select(col(langCol).as("lang"),
        explode(tokenize(col(textCol))).as("tok"))
      .groupBy(col("lang"))
      .agg(approx_count_distinct(col("tok"), rsd).as("n_distinct_tokens"))
    docAgg.join(tokAgg, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("n_distinct_tokens"),
        col("__p")(0).as("p50_chars"), col("__p")(1).as("p90_chars"))
      .orderBy(col("lang"))
  }

  /** Accuracy-gated profile for the driver's hash comparator: runs the
    * sketches AND the exact aggregates, keeps only languages where the
    * HLL count lands within `maxRelErr` of truth and each approximate
    * percentile lands inside the exact ±2%-rank value band (the
    * sketch's guaranteed 1e-4 rank error is 200× tighter), and emits
    * the EXACT values — SQL-replayable, so a sketch drifting out of
    * tolerance surfaces as a missing row in the hash compare. Same
    * policy as the ANN recall gates: the approximate path is exercised
    * for real, the oracle row certifies it. */
  def approxProfileGate(
      df: DataFrame,
      langCol: String,
      textCol: String,
      maxRelErr: Double = 0.1): DataFrame = {
    val exactDoc = df
      .select(col(langCol).as("lang"), length(col(textCol)).as("__len"))
      .groupBy(col("lang"))
      .agg(percentile(col("__len"),
        array(lit(0.48), lit(0.5), lit(0.52), lit(0.88), lit(0.9),
          lit(0.92))).as("__e"))
    val exactTok = df
      .select(col(langCol).as("lang"),
        explode(tokenize(col(textCol))).as("tok"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("tok")).as("__exact_nt"))
    approxProfile(df, langCol, textCol)
      .join(exactDoc, Seq("lang"), "left")
      .join(exactTok, Seq("lang"), "left")
      .where(
        abs(col("n_distinct_tokens") - col("__exact_nt")) <=
          col("__exact_nt") * maxRelErr &&
        col("p50_chars").cast("double").between(col("__e")(0), col("__e")(2)) &&
        col("p90_chars").cast("double").between(col("__e")(3), col("__e")(5)))
      .select(col("lang"), col("n_docs"),
        col("__exact_nt").as("n_distinct_tokens"),
        round(col("__e")(1), 4).as("p50_chars"),
        round(col("__e")(4), 4).as("p90_chars"))
      .orderBy(col("lang"))
  }

  /** One persisted-able HLL sketch of the distinct token vocabulary —
    * the INCREMENTAL corpus-stats primitive: DataSketches HLL unions
    * losslessly (`sketch(A ∪ B) == union(sketch(A), sketch(B))`), so a
    * daily ingestion pipeline stores one small binary per increment
    * and tracks corpus-lifetime vocabulary without ever re-scanning
    * history. Returns a single-row frame with a `sketch` binary
    * column; shuffle bytes are O(partitions × 2^lgK), independent of
    * corpus size. */
  def vocabSketch(df: DataFrame, textCol: String, lgK: Int = 12): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(explode(tokenize(col(textCol))).as("tok"))
      .agg(hll_sketch_agg(col("tok"), lit(lgK)).as("sketch"))

  /** Union previously-persisted increment sketches and estimate the
    * lifetime distinct-token count. Strict mode: mixed-lgK sketches
    * raise instead of silently degrading to the coarsest. */
  def vocabUnionEstimate(sketches: DataFrame): Long =
    sketches
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sketch"), lit(false))).as("est"))
      .head().getLong(0)

  /** Top-`topK` vocabulary with counts, rank, and cumulative corpus
    * coverage — the "how much of the stream do the head tokens
    * explain" profile used when sizing tokenizer vocabularies.
    *
    * Scale shape: explode + partial-aggregated `groupBy(token)` (the
    * only corpus-sized shuffle), a `TakeOrderedAndProject` top-k, and
    * a one-row total aggregate broadcast back. The rank/coverage
    * window runs over `topK` rows — bounded by the PARAMETER, not the
    * corpus, so the single-partition window is fine (same shape as the
    * exact-kNN top-k merge). */
  def vocabulary(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK > 0, s"graft: topK must be positive, got $topK")
    val counts = df
      .where(col(textCol).isNotNull)
      .select(explode(tokenize(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("double").as("__total"))
    val w = Window.orderBy(col("cnt").desc, col("token"))
    counts
      .orderBy(col("cnt").desc, col("token"))
      .limit(topK)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_share",
        round(
          sum(col("cnt")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double") / col("__total"),
          6))
      .select(col("token"), col("cnt"), col("rank"), col("cum_share"))
  }
}
