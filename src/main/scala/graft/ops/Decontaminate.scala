package graft.ops

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

import graft.functions.WordShingles

/** Benchmark decontamination — flag training documents that share word
  * n-grams with a held-out evaluation set, the standard pre-training
  * hygiene step (GPT-3 appendix C / PaLM / Llama use 8–13-gram overlap
  * against eval benchmarks; not in the reference engine, which stops at
  * dedup — this is part of the training-data-pipeline surface).
  *
  * Scale design: the BENCHMARK side is small by definition (eval sets
  * are millions of n-grams at most, vs the 100 TB corpus), so its
  * distinct shingle set is collected once and broadcast; the corpus
  * pass is then a single codegen'd map-side expression — no shuffle, no
  * explode, no join. A 1000-executor scan reads each corpus row once
  * and probes an in-memory hash set. For benchmark sets too big to
  * broadcast exactly, pre-filter with `Bm25.arrayToBloom` membership
  * and verify the survivors with this exact set.
  */
object Decontaminate {

  /** Distinct space-joined word `n`-gram shingles of the benchmark
    * corpus, collected to the driver and broadcast. Size is logged by
    * Spark's broadcast machinery; eval benchmarks fit comfortably
    * (13-gram MMLU ≈ low millions of strings). */
  def benchmarkShingles(
      bench: DataFrame,
      textCol: String,
      n: Int): Broadcast[java.util.HashSet[UTF8String]] = {
    val spark = bench.sparkSession
    val rows = bench
      .select(explode(shingleCol(col(textCol), n)).as("g"))
      .distinct()
      .collect()
    val set = new java.util.HashSet[UTF8String](rows.length * 2)
    rows.foreach(r => set.add(UTF8String.fromString(r.getString(0))))
    spark.sparkContext.broadcast(set)
  }

  private def shingleCol(text: Column, n: Int): Column =
    GraftSqlShim.column(WordShingles(GraftSqlShim.expression(text), n))

  /** Per-document count of DISTINCT benchmark-overlapping `n`-grams —
    * one narrow map-side column, no shuffle. */
  def contaminationCount(
      text: Column,
      benchSet: Broadcast[java.util.HashSet[UTF8String]],
      n: Int): Column =
    GraftSqlShim.column(CountInBroadcastSet(
      GraftSqlShim.expression(shingleCol(text, n)), benchSet))

  /** The eval-set embedding matrix (plus precomputed double norms),
    * collected and broadcast — eval sets are small by nature, the same
    * budget argument as [[benchmarkShingles]]. */
  def benchmarkEmbeddings(
      bench: DataFrame,
      vecCol: String): Broadcast[Array[(Array[Float], Double)]] = {
    val spark = bench.sparkSession
    val rows = bench.select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
      .map { v =>
        var s = 0.0
        var i = 0
        while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
        (v, math.sqrt(s))
      }
    spark.sparkContext.broadcast(rows)
  }

  /** Max cosine similarity of `vec` to any benchmark embedding — one
    * codegen'd map-side column, no join, no shuffle: the semantic
    * (embedding-space) analog of [[contaminationCount]], catching
    * paraphrased eval leakage that n-gram overlap misses. */
  def maxBenchSimilarity(
      vec: Column,
      benchVecs: Broadcast[Array[(Array[Float], Double)]]): Column =
    GraftSqlShim.column(MaxCosToBroadcast(
      GraftSqlShim.expression(vec), benchVecs))

  /** Corpus rows annotated with `n_contaminated` (distinct shared
    * `n`-grams) and `flagged` (count >= `minOverlap`) — callers keep
    * `where(!flagged)`. The benchmark set is built and broadcast here;
    * reuse [[benchmarkShingles]] + [[contaminationCount]] directly to
    * amortize one benchmark set across many corpus passes. */
  def flag(
      corpus: DataFrame,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int = 13,
      minOverlap: Int = 2): DataFrame = {
    val set = benchmarkShingles(bench, benchTextCol, n)
    corpus
      // null text has no shingles → clean, not NULL: the documented
      // where(!flagged) filter would otherwise silently DROP null-text
      // rows (three-valued logic) instead of passing them through
      .withColumn("n_contaminated",
        coalesce(contaminationCount(col(textCol), set, n), lit(0)))
      .withColumn("flagged", col("n_contaminated") >= minOverlap)
  }
}

/** Count of DISTINCT array<string> elements present in a broadcast hash
  * set. Codegen'd; the inner hash set of HITS is only allocated when a
  * document actually overlaps (clean documents — the overwhelming
  * majority — stay allocation-free). */
case class CountInBroadcastSet(
    child: Expression,
    bcast: Broadcast[java.util.HashSet[UTF8String]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_in_broadcast_set expects array<string>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_broadcast_set"

  override def nullSafeEval(v: Any): Any =
    CountInBroadcastSet.compute(v.asInstanceOf[ArrayData], bcast.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("benchSet", bcast,
      "org.apache.spark.broadcast.Broadcast")
    // raw-type cast: janino's generics support is too limited for a
    // parameterized cast in generated code
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.CountInBroadcastSet.compute($c, (java.util.HashSet) $ref.value())")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInBroadcastSet =
    copy(child = newChild)
}

/** Max cosine similarity of an `array<float>` vector against a
  * broadcast eval-embedding matrix (vectors paired with precomputed
  * double norms). Double accumulation in index order — the same
  * arithmetic the SQL oracle replays, so results round-compare
  * exactly. Codegen'd; zero allocation per row. */
case class MaxCosToBroadcast(
    child: Expression,
    bcast: Broadcast[Array[(Array[Float], Double)]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"max_cos_to_broadcast expects array<float>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "max_cos_to_broadcast"

  override def nullSafeEval(v: Any): Any =
    MaxCosToBroadcast.compute(v.asInstanceOf[ArrayData], bcast.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("benchVecs", bcast,
      "org.apache.spark.broadcast.Broadcast")
    // raw-type cast: janino cannot parse a parameterized cast
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.MaxCosToBroadcast.compute($c, (scala.Tuple2[]) $ref.value())")
  }

  override protected def withNewChildInternal(newChild: Expression): MaxCosToBroadcast =
    copy(child = newChild)
}

object MaxCosToBroadcast {
  def compute(arr: ArrayData, bench: Array[(Array[Float], Double)]): Double = {
    val n = arr.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = arr.getFloat(i).toDouble
      ss += x * x
      i += 1
    }
    val norm = math.sqrt(ss)
    var best = -1.0
    var b = 0
    while (b < bench.length) {
      val (bv, bnorm) = bench(b)
      if (bv.length == n && bnorm > 0 && norm > 0) {
        var dot = 0.0
        var j = 0
        while (j < n) {
          dot += arr.getFloat(j).toDouble * bv(j)
          j += 1
        }
        val cos = dot / (norm * bnorm)
        if (cos > best) best = cos
      }
      b += 1
    }
    best
  }
}

object CountInBroadcastSet {
  def compute(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var hits: java.util.HashSet[UTF8String] = null
    var c = 0
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (set.contains(s)) {
        if (hits == null) hits = new java.util.HashSet[UTF8String]()
        if (hits.add(s)) c += 1
      }
      i += 1
    }
    c
  }
}
