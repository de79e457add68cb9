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
