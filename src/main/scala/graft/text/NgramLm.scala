package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character n-gram language-model scoring — the CCNet/ RefinedWeb
  * quality signal (Wenzek et al., "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data", LREC 2020 uses a KenLM
  * perplexity; this is the self-contained char-trigram analog): score
  * each document by the mean negative log2 probability of its
  * characters under an add-α trigram model fit on the corpus itself.
  * Gibberish, encoding garbage, and boilerplate-free randomness score
  * high; natural in-domain text scores low.
  *
  * Scale shape:
  *  - counting: positions explode map-side (rows ≈ chars, but each row
  *    is a ≤3-char gram), then one hash aggregate with map-side
  *    combine — shuffle ≈ unique grams, not corpus size;
  *  - scoring: the LM tables are charset-bounded (|Σ|³ rows — ~20 MB
  *    for ASCII-ish corpora), so both joins take a `broadcast` hint by
  *    default and the per-position probability lookup is map-side,
  *    skew-immune (hot trigrams like `"the"` never converge on one
  *    task). For very large charsets (CJK) disable via
  *    `spark.graft.lm.broadcast=false` and AQE picks the join;
  *  - the per-doc mean is one groupBy(doc_id) — rows = positions, but
  *    only (doc_id, double) wide.
  */
object NgramLm {

  /** Stride-1 character n-gram positions: `(doc_id, gram)`. */
  private def positions(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
      .withColumn("pos", explode(when(
        length(col("__text")) >= n,
        sequence(lit(1), length(col("__text")) - (n - 1)))
        .otherwise(array().cast("array<int>"))))
      .select(col("doc_id"), col("__text").substr(col("pos"), lit(n)).as("gram"))

  /** Corpus char n-gram counts `(gram, cnt)` — one partial-aggregated
    * pass. */
  def charNgramCounts(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    positions(docs, idCol, textCol, n)
      .groupBy("gram").agg(count(lit(1)).as("cnt"))

  /** Per-doc mean −log2 P(c₃ | c₁c₂) under the corpus-fit add-α
    * trigram model: `(doc_id, ppl_bits)`, docs shorter than 3 chars
    * excluded. P = (n₃ + α) / (n₂ + α·V) with V = corpus distinct
    * chars; both joins are exact on gram strings, so the only
    * float steps are one IEEE division, one log2, one mean.
    */
  def perplexityBits(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    val useBroadcast =
      spark.conf.getOption("spark.graft.lm.broadcast").forall(_.toBoolean)
    def lm(df: DataFrame): DataFrame = if (useBroadcast) broadcast(df) else df

    val n3 = lm(charNgramCounts(docs, idCol, textCol, 3)
      .withColumnRenamed("cnt", "n3"))
    val n2 = lm(charNgramCounts(docs, idCol, textCol, 2)
      .withColumnRenamed("gram", "ctx").withColumnRenamed("cnt", "n2"))
    val vocab = charNgramCounts(docs, idCol, textCol, 1).count()

    positions(docs, idCol, textCol, 3)
      .join(n3, "gram")
      .withColumn("ctx", col("gram").substr(1, 2))
      .join(n2, "ctx")
      .withColumn("lp",
        -log2((col("n3") + alpha) / (col("n2") + alpha * vocab)))
      .groupBy("doc_id")
      .agg(round(avg(col("lp")), 4).as("ppl_bits"))
  }

  /** Corpus-frequency heavy hitters: top-`k` word `n`-grams by count,
    * count-desc then gram-asc deterministic order. Tokenization matches
    * [[TextAnalysis]]'s `[^a-z0-9]+` lowercase split. One explode +
    * one partial-aggregated count + a driver-side top-k
    * (TakeOrderedAndProject — k rows, never a global sort). */
  def topNgrams(
      docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    val toks = filter(
      split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")
    docs
      .select(explode(gramsExpr(toks, n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
  }

  /** Word n-gram array from a token array: join n consecutive tokens
    * with a space; empty when the doc has < n tokens. */
  private def gramsExpr(toks: Column, n: Int): Column =
    if (n == 1) toks
    else {
      // windows via start indices (guarded: sequence(1,0) DESCENDS)
      transform(
        when(size(toks) >= n, sequence(lit(1), size(toks) - (n - 1)))
          .otherwise(array().cast("array<int>")),
        i => concat_ws(" ",
          (0 until n).map(o => element_at(toks, i + o)): _*))
    }
}
