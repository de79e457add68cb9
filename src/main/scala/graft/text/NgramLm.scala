package graft.text

import java.util.Arrays

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  *  - counting: ONE explode of bijectively long-encoded gram keys (all
  *    of n=1,2,3 in a single pass — see [[NgramKeys]]) into one hash
  *    aggregate with map-side combine. Shuffle rows ≈ corpus chars ×3
  *    but each only 8 bytes wide; shuffle OUTPUT ≈ unique grams;
  *  - scoring: the fitted tables are charset-bounded (≤|Σ|³ rows), so
  *    when they fit `spark.graft.lm.maxDriverGrams` (default 2M) they
  *    are collected once, broadcast as sorted primitive arrays, and
  *    each doc is scored by ONE codegen'd pass ([[TrigramNll]]) — no
  *    position explode, no joins, no groupBy, skew-immune by
  *    construction. For very large charsets (CJK at web scale) the
  *    plan falls back to the declarative join path whose LM joins are
  *    broadcast-hinted (disable via `spark.graft.lm.broadcast=false`
  *    and AQE picks the join).
  */
object NgramLm {

  /** Stride-1 character n-gram positions: `(doc_id, gram)`. Kept for
    * the large-charset fallback path. */
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

  /** All 1/2/3-gram keys of the corpus in one pass: `(k, cnt)` with
    * the [[NgramKeys]] long encoding. */
  def ngramKeyCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(GraftSqlShim.column(
        NgramKeys(GraftSqlShim.expression(col(textCol))))).as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))

  /** Per-doc mean −log2 P(c₃ | c₁c₂) under the corpus-fit add-α
    * trigram model: `(doc_id, ppl_bits)`, docs shorter than 3 chars
    * excluded. P = (n₃ + α) / (n₂ + α·V) with V = corpus distinct
    * chars; the only float steps are one IEEE division, one log2, one
    * mean — identical in both physical regimes.
    */
  def perplexityBits(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    val maxDriverGrams = graft.GraftConf.lmMaxDriverGrams(spark)

    val counts = ngramKeyCounts(docs, textCol).cache()
    try {
      if (counts.count() <= maxDriverGrams) {
        val rows = counts.collect()
        val bc = spark.sparkContext.broadcast(LmTables.fromKeyCounts(
          rows.map(r => (r.getLong(0), r.getLong(1)))))
        docs
          .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
          .where(col("__text").isNotNull && length(col("__text")) >= 3)
          .select(col("doc_id"),
            round(GraftSqlShim.column(TrigramNll(
              GraftSqlShim.expression(col("__text")), bc, alpha)), 4)
              .as("ppl_bits"))
      } else perplexityBitsJoined(docs, idCol, textCol, alpha)
    } finally { counts.unpersist(); () }
  }

  /** CCNet-style per-language quality bucketing (Wenzek et al., LREC
    * 2020): docs split into head / middle / tail by the LANGUAGE's own
    * perplexity terciles — the standard "keep the head, sample the
    * middle, drop the tail" curation step.
    *
    * Scale shape: thresholds are one tiny per-language aggregate
    * broadcast back — no per-language global window (an ntile() over
    * `PARTITION BY lang` would funnel an entire language through one
    * task). The exact `percentile` keeps O(distinct ppl) memory per
    * language; at true 100 TB swap `percentile_approx`, as CCNet
    * itself computes thresholds on a sample. Thresholds snap to the
    * same 1e-4 grid as `ppl_bits`, making the ≤ comparisons exact
    * (tercile fractions 1/3, 2/3 can never interpolate onto a
    * half-grid point, so the snap is ulp-robust). */
  def ccnetBuckets(
      docs: DataFrame,
      idCol: String,
      langCol: String,
      textCol: String,
      alpha: Double = 0.5): DataFrame = {
    val pp = perplexityBits(docs, idCol, textCol, alpha)
    val withLang = pp.join(
      docs.select(col(idCol).cast("long").as("doc_id"),
        col(langCol).as("lang")),
      Seq("doc_id"))
    def grid(c: Column) = floor(c * 1e4 + 0.5) / 1e4
    val th = withLang.groupBy("lang").agg(
      grid(percentile(col("ppl_bits"), lit(1.0 / 3))).as("t1"),
      grid(percentile(col("ppl_bits"), lit(2.0 / 3))).as("t2"))
    withLang.join(broadcast(th), Seq("lang"))
      .withColumn("bucket",
        when(col("ppl_bits") <= col("t1"), "head")
          .when(col("ppl_bits") <= col("t2"), "middle")
          .otherwise("tail"))
      .select("doc_id", "lang", "ppl_bits", "bucket")
  }

  /** Declarative fallback regime: positions join the distributed LM
    * count tables. Used when the charset is too large to collect. */
  def perplexityBitsJoined(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    val useBroadcast = graft.GraftConf.lmBroadcast(spark)
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
    * [[TextAnalysis]]'s `[^a-z0-9]+` lowercase split (via the native
    * [[graft.functions.WordShingles]] single pass — the captured-array
    * `transform` form re-evaluated the token split per element, which
    * is quadratic in doc length). One explode + one partial-aggregated
    * count + a driver-side top-k (TakeOrderedAndProject — k rows,
    * never a global sort). */
  def topNgrams(
      docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    docs
      .select(explode(GraftSqlShim.column(graft.functions.WordShingles(
        GraftSqlShim.expression(col(textCol)), n))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
}

/** Fitted add-α trigram LM tables as sorted primitive arrays (compact
  * to broadcast, boxing-free to probe): binary-search lookup, `vocab`
  * = corpus distinct chars. */
case class LmTables(
    triKeys: Array[Long], triCnts: Array[Long],
    biKeys: Array[Long], biCnts: Array[Long],
    vocab: Long) extends Serializable {
  def tri(key: Long): Long = {
    val i = Arrays.binarySearch(triKeys, key)
    if (i >= 0) triCnts(i) else 0L
  }
  def bi(key: Long): Long = {
    val i = Arrays.binarySearch(biKeys, key)
    if (i >= 0) biCnts(i) else 0L
  }
}

object LmTables {
  def fromKeyCounts(rows: Array[(Long, Long)]): LmTables = {
    var nTri = 0; var nBi = 0; var vocab = 0L
    rows.foreach { case (k, _) =>
      if (k < 0) nTri += 1
      else if (k >= NgramKeys.Off2) nBi += 1
      else vocab += 1
    }
    val triKeys = new Array[Long](nTri); val triCnts = new Array[Long](nTri)
    val biKeys = new Array[Long](nBi); val biCnts = new Array[Long](nBi)
    var ti = 0; var bi = 0
    rows.foreach { case (k, c) =>
      if (k < 0) { triKeys(ti) = k; triCnts(ti) = c; ti += 1 }
      else if (k >= NgramKeys.Off2) { biKeys(bi) = k; biCnts(bi) = c; bi += 1 }
    }
    sortParallel(triKeys, triCnts)
    sortParallel(biKeys, biCnts)
    LmTables(triKeys, triCnts, biKeys, biCnts, vocab)
  }

  /** Sort `keys` ascending, permuting `cnts` identically. */
  private def sortParallel(keys: Array[Long], cnts: Array[Long]): Unit = {
    val idx = Array.range(0, keys.length)
      .sortBy(keys(_))
    val k2 = new Array[Long](keys.length)
    val c2 = new Array[Long](keys.length)
    var i = 0
    while (i < idx.length) { k2(i) = keys(idx(i)); c2(i) = cnts(idx(i)); i += 1 }
    System.arraycopy(k2, 0, keys, 0, keys.length)
    System.arraycopy(c2, 0, cnts, 0, cnts.length)
  }
}

/** All 1/2/3-char-gram occurrences of a string, bijectively encoded as
  * longs in ONE code-point pass (no substring allocation, no repeated
  * scans): unigram cp < 2^21 as-is; bigram `Off2 + (cp1<<21|cp2)`;
  * trigram sign-bit-tagged `Long.MinValue | (cp1<<42|cp2<<21|cp3)`.
  * Ranges are pairwise disjoint (code points are ≤ 21 bits), so one
  * long column aggregates all three orders at once.
  */
case class NgramKeys(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_keys expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_keys"

  override def nullSafeEval(v: Any): Any =
    NgramKeys.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.NgramKeys.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NgramKeys =
    copy(child = newChild)
}

object NgramKeys {
  /** Bigram range offset: unigrams live below it. */
  val Off2: Long = 1L << 21

  def bigramKey(c1: Int, c2: Int): Long =
    Off2 + ((c1.toLong << 21) | c2.toLong)
  def trigramKey(c1: Int, c2: Int, c3: Int): Long =
    java.lang.Long.MIN_VALUE | ((c1.toLong << 42) | (c2.toLong << 21) | c3.toLong)

  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val sl = str.length
    // code points (so the encoding matches substr/length semantics,
    // which count code points, for astral-plane text too)
    var cpCount = 0
    var i = 0
    while (i < sl) { i += Character.charCount(str.codePointAt(i)); cpCount += 1 }
    val cps = new Array[Int](cpCount)
    i = 0; var j = 0
    while (i < sl) {
      val cp = str.codePointAt(i)
      cps(j) = cp; j += 1
      i += Character.charCount(cp)
    }
    val n1 = cpCount
    val n2 = math.max(cpCount - 1, 0)
    val n3 = math.max(cpCount - 2, 0)
    val out = new Array[Long](n1 + n2 + n3)
    var o = 0
    var p = 0
    while (p < n1) { out(o) = cps(p).toLong; o += 1; p += 1 }
    p = 0
    while (p < n2) { out(o) = bigramKey(cps(p), cps(p + 1)); o += 1; p += 1 }
    p = 0
    while (p < n3) { out(o) = trigramKey(cps(p), cps(p + 1), cps(p + 2)); o += 1; p += 1 }
    ArrayData.toArrayData(out)
  }
}

/** Mean −log2 P(c₃|c₁c₂) of a ≥3-char string under broadcast
  * [[LmTables]] — the whole scoring job is this one codegen'd call per
  * document. Float-op sequence matches the declarative fallback
  * exactly: per position one divide, one log2 (log/log 2, as Spark's
  * `log2`), negate; then mean. */
case class TrigramNll(
    child: Expression,
    bcast: Broadcast[LmTables],
    alpha: Double)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"trigram_nll expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "trigram_nll"

  override def nullSafeEval(v: Any): Any =
    TrigramNll.compute(v.asInstanceOf[UTF8String], bcast.value, alpha)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmTables", bcast,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"graft.text.TrigramNll.compute($c, (graft.text.LmTables) $ref.value(), $alpha)")
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramNll =
    copy(child = newChild)
}

object TrigramNll {
  private val Log2 = math.log(2.0)

  def compute(s: UTF8String, t: LmTables, alpha: Double): Double = {
    val str = s.toString
    val sl = str.length
    val aV = alpha * t.vocab
    var sum = 0.0
    var k = 0
    // rolling last-two code points
    var c1 = -1; var c2 = -1
    var i = 0
    while (i < sl) {
      val cp = str.codePointAt(i)
      if (c1 >= 0 && c2 >= 0) {
        val n3 = t.tri(NgramKeys.trigramKey(c1, c2, cp))
        val n2 = t.bi(NgramKeys.bigramKey(c1, c2))
        sum += -(math.log((n3 + alpha) / (n2 + aV)) / Log2)
        k += 1
      }
      c1 = c2; c2 = cp
      i += Character.charCount(cp)
    }
    if (k == 0) 0.0 else sum / k
  }
}
