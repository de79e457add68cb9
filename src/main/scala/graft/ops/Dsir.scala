package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{PolyHash31, WordShingles}

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): select raw-corpus documents whose hashed-n-gram
  * distribution resembles a TARGET domain. Two bag-of-hashed-grams
  * unigram models are fit — p̂ on the target sample, q̂ on the raw
  * corpus — and each document is weighted by
  * `log w(x) = Σ_f c_f(x)·(log p̂_f − log q̂_f)` over its hashed word
  * uni+bigram features; selection takes the top-k weights (optionally
  * Gumbel-perturbed for the paper's sampling-without-replacement).
  *
  * Reference context: the reference engine has no data-selection
  * surface; this is part of the training-data stack built alongside
  * [[Dedup]] / [[Decontaminate]].
  *
  * Scale shape: feature counting is one explode of native-computed
  * shingles into a `buckets`-bounded hash aggregate (map-side combine;
  * shuffle output ≤ `buckets` rows per side). The fitted log-ratio
  * table is a single double array of length `buckets` (a few KB — far
  * under any driver budget), broadcast once; scoring is then ONE
  * codegen'd pass per document ([[DsirScore]]) — no joins, no
  * position explode, skew-immune by construction.
  *
  * Hashing uses the SQL-replayable [[PolyHash31]] (code-point
  * polynomial mod 2³¹−1) so the whole pipeline — features, fit,
  * per-doc weight — replays exactly in ANSI SQL for the oracle gate.
  */
object Dsir {

  /** Word uni+bigram features of `text`, bucketed to `[0, buckets)`:
    * one row per gram OCCURRENCE — `(bucket)`. */
  def hashedGrams(text: Column, buckets: Int): Column = {
    val grams = concat(
      GraftSqlShim.column(WordShingles(GraftSqlShim.expression(text), 1)),
      GraftSqlShim.column(WordShingles(GraftSqlShim.expression(text), 2)))
    transform(grams, g =>
      (GraftSqlShim.column(PolyHash31(GraftSqlShim.expression(g), 31)) % buckets)
        .cast("int"))
  }

  /** Per-bucket gram-occurrence counts of a corpus slice: `(bucket,
    * cnt)` — at most `buckets` rows out of the aggregate. */
  def bucketCounts(docs: DataFrame, textCol: String, buckets: Int): DataFrame =
    docs
      .select(explode(hashedGrams(col(textCol), buckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Fitted per-bucket log-likelihood ratios `log p̂_f − log q̂_f`,
    * add-α smoothed over the `buckets`-sized feature space. */
  def fit(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      buckets: Int = 4096,
      alpha: Double = 0.5): Array[Double] = {
    def collectCounts(df: DataFrame): (Array[Long], Long) = {
      val arr = new Array[Long](buckets)
      var total = 0L
      bucketCounts(df, textCol, buckets).collect().foreach { r =>
        val c = r.getLong(1)
        arr(r.getInt(0)) = c
        total += c
      }
      (arr, total)
    }
    val (ct, tt) = collectCounts(target)
    val (cr, tr) = collectCounts(raw)
    val lam = new Array[Double](buckets)
    var f = 0
    while (f < buckets) {
      lam(f) = math.log((ct(f) + alpha) / (tt + alpha * buckets)) -
        math.log((cr(f) + alpha) / (tr + alpha * buckets))
      f += 1
    }
    lam
  }

  /** Per-document importance log-weights against a fitted table:
    * `(idCol, logw)`. Null-text docs are excluded; token-free docs
    * score 0. */
  def logWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lambda: Array[Double],
      buckets: Int): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(lambda)
    docs
      .where(col(textCol).isNotNull)
      .select(col(idCol),
        GraftSqlShim.column(DsirScore(
          GraftSqlShim.expression(col(textCol)), bc, buckets)).as("logw"))
  }

  /** End-to-end selection: fit on `targetPred` docs vs the whole
    * corpus, then keep the `k` highest-weighted docs (weight desc, id
    * asc — deterministic). `gumbelSeed` adds the paper's
    * sampling-without-replacement perturbation `−log(−log u)` with a
    * per-doc hash-derived uniform — still deterministic and
    * SQL-replayable. */
  def select(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      k: Int,
      buckets: Int = 4096,
      alpha: Double = 0.5,
      gumbelSeed: Option[Long] = None): DataFrame = {
    val lambda = fit(docs.where(targetPred), docs, textCol, buckets, alpha)
    val w = logWeights(docs, idCol, textCol, lambda, buckets)
    val keyed = gumbelSeed match {
      case None => w.withColumn("key", col("logw"))
      case Some(seed) =>
        // u ∈ (0,1) from a splitmix-style integer mix of (id, seed):
        // replayable in SQL as arithmetic on bigints
        val u = (pmod(col(idCol).cast("long") * 2654435761L + seed,
          lit(2147483647L)) + 1.0) / 2147483649.0
        w.withColumn("key", col("logw") - log(-log(u)))
    }
    keyed
      .orderBy(col("key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("logw"), col("key"))
  }
}

/** Sum of broadcast per-bucket log-ratios over a document's hashed
  * word uni+bigram features — the whole DSIR scoring job is this one
  * codegen'd call per document. Tokenization, bigram join and
  * [[PolyHash31]] bucketing are byte-identical to the declarative
  * [[Dsir.hashedGrams]] form (asserted in DsirSpec). */
case class DsirScore(
    child: Expression,
    bcast: Broadcast[Array[Double]],
    buckets: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dsir_score expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dsir_score"

  override def nullSafeEval(v: Any): Any =
    DsirScore.compute(v.asInstanceOf[UTF8String], bcast.value, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirLambda", bcast,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.DsirScore.compute($c, (double[]) $ref.value(), $buckets)")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
}

object DsirScore {
  def compute(s: UTF8String, lambda: Array[Double], buckets: Int): Double = {
    var sum = 0.0
    var n = 1
    while (n <= 2) {
      val grams = WordShingles.compute(s, n)
      val m = grams.numElements()
      var i = 0
      while (i < m) {
        sum += lambda((PolyHash31.compute(
          grams.getUTF8String(i), 31) % buckets).toInt)
        i += 1
      }
      n += 1
    }
    sum
  }
}
