package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.text.PorterStemmer

/** Snowball-English stem of a single (lowercase) token.
  * Matches the reference's rust-stemmers English algorithm
  * (lantern_extras/src/stemmers.rs:95-152). Codegen calls the static
  * JVM method directly, staying inside whole-stage codegen.
  */
case class StemWord(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"stem expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "stem"

  override def nullSafeEval(v: Any): Any =
    PorterStemmer.stemUTF8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.text.PorterStemmer.stemUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): StemWord =
    copy(child = newChild)
}

/** Native single-pass tokenizer: lowercase, split on non-letter/
  * non-number code points, drop empties — value-identical to the
  * declarative `filter(split(regexp_replace(lower(c), "[^\p{L}\p{N}]+",
  * " "), " "), t -> length(t) > 0)` (pinned by NativeTextParitySpec).
  * Exists because that composition's filter lambda is CodegenFallback:
  * every consumer of tokenize (BM25 build explode, token counts, dedup
  * token columns) dropped to interpreted eval through it.
  *
  * CANONICAL CASE-FOLDING: per-code-point `Character.toLowerCase` —
  * locale-independent and never length-changing. This deliberately
  * diverges from the declarative form on the handful of code points
  * where full-string lowercasing EXPANDS: U+0130 'İ' lowers to
  * "i̇" under String.toLowerCase (the combining dot then splits
  * the token) but to plain 'i' here. The single-pass form is the
  * defined behavior; the divergence is pinned explicitly in
  * NativeTextParitySpec ("case-folding canon").
  */
case class TokenizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tokenize expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"

  override def nullSafeEval(v: Any): Any =
    TokenizeExpr.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenizeExpr =
    copy(child = newChild)
}

object TokenizeExpr {
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = RepetitionStats.tokenizeText(s.toString)
    val out = new Array[UTF8String](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Native tokenize → Porter2 stem → drop stopwords (post-stem, like
  * the reference) in one pass — `text_to_stem_array`'s hot path. The
  * declarative transform+filter form is its parity oracle in
  * NativeTextParitySpec. */
case class StemTokensExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"text_to_stem_array expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "text_to_stem_array"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(v: Any): Any =
    StemTokensExpr.compute(v.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stemStops", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StemTokensExpr.compute($c, (java.util.HashSet) $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): StemTokensExpr =
    copy(child = newChild)
}

object StemTokensExpr {
  def compute(s: UTF8String,
      stops: java.util.HashSet[String]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = RepetitionStats.tokenizeText(s.toString)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](toks.length)
    var i = 0
    while (i < toks.length) {
      val stemmed = graft.text.PorterStemmer.stem(toks(i))
      if (!stops.contains(stemmed)) out += UTF8String.fromString(stemmed)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }
}

/** SQL-REPRODUCIBLE 31-bit polynomial string hash:
  * fold over code points of `h = (h * mult + cp) mod (2^31 - 1)`.
  *
  * Exists so hash-derived operators (simhash sketches, winnowing
  * fingerprints, doc fingerprints) have query variants an external
  * ANSI-SQL oracle can replay exactly — xxhash64 has no DuckDB analog.
  * DuckDB equivalent:
  * {{{
  * list_reduce(list_prepend(CAST(0 AS BIGINT),
  *   list_transform(range(1, len(t)+1), i -> ascii(t[i]))),
  *   (a, b) -> (a * M + b) % 2147483647)
  * }}}
  * (DuckDB `ascii` yields the code point, hence code points here, not
  * bytes.) NOT a quality hash — 31 bits, low avalanche; production
  * paths default to xxhash64 and only the oracle-checked variants use
  * this.
  */
case class PolyHash31(child: Expression, mult: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"polyhash31 expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "polyhash31"

  override def nullSafeEval(v: Any): Any =
    PolyHash31.compute(v.asInstanceOf[UTF8String], mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyHash31.compute($c, $mult)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash31 =
    copy(child = newChild)
}

/** Count of the single most frequent element in an array<string> —
  * one O(n) hash-count pass. The built-in higher-order composition
  * (`transform(array_distinct(a), g -> size(filter(a, x -> x = g)))`)
  * is O(distinct·n) AND interpreted (higher-order lambdas never enter
  * codegen), which measured minutes over a corpus; this stays inside
  * whole-stage codegen via a static call. Returns 0 for empty arrays.
  */
case class ArrayModeCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"array_mode_count expects array<string>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_mode_count"

  override def nullSafeEval(v: Any): Any =
    ArrayModeCount.compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayModeCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ArrayModeCount =
    copy(child = newChild)
}

object ArrayModeCount {
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      // null elements count as a (single) key too — matches the
      // higher-order formulation only on null-free inputs, which
      // tokenize/shingles guarantee
      val k = arr.getUTF8String(i)
      val c = counts.merge(k, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }
}

/** All four Gopher-style repetition signals in ONE native pass over
  * the raw text: struct(top_ngram, dup_ngram, max_token, dup_line),
  * each a fraction in [0,1] (0 on empty input).
  *
  * Exists because the equivalent built-in composition (tokenize →
  * shingles → mode/distinct via transform/filter lambdas) contains
  * higher-order functions, which are CodegenFallback: the WHOLE
  * projection drops out of codegen AND interpreted projections do no
  * common-subexpression elimination, so tokenize re-evaluates once per
  * reference (~12× per row, measured ~19 ms/doc → 90 s for a 5k-doc
  * write). This expression tokenizes once (lowercased code points,
  * letter/number classes — the [[graft.functions.tokenize]] charset)
  * and hash-counts everything in O(tokens).
  */
case class RepetitionStats(child: Expression, topN: Int, dupN: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(v: Any): Any =
    RepetitionStats.compute(v.asInstanceOf[UTF8String], topN, dupN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RepetitionStats.compute($c, $topN, $dupN)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("top_ngram", DoubleType, nullable = false),
    StructField("dup_ngram", DoubleType, nullable = false),
    StructField("max_token", DoubleType, nullable = false),
    StructField("dup_line", DoubleType, nullable = false)))

  private[functions] def isTokenCharPublic(cp: Int): Boolean = isTokenChar(cp)

  private def isTokenChar(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }

  /** Shared single-pass tokenizer: lowercase, split on non-letter/
    * non-number code points — the [[graft.functions.tokenize]] charset. */
  private[functions] def tokenizeText(text: String): Array[String] = {
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (isTokenChar(cp)) sb.appendCodePoint(Character.toLowerCase(cp))
      else if (sb.length > 0) { toks += sb.toString; sb.setLength(0) }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) toks += sb.toString
    toks.toArray
  }

  def compute(s: UTF8String, topN: Int, dupN: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val text = s.toString
    val toks = tokenizeText(text)

    def gramFracs(n: Int): (Double, Double) = {
      val m = toks.length - n + 1
      if (m <= 0) (0.0, 0.0)
      else {
        val counts = new java.util.HashMap[String, Int](m * 2)
        var best = 0
        var j = 0
        val g = new java.lang.StringBuilder()
        while (j < m) {
          g.setLength(0)
          var p = 0
          while (p < n) {
            if (p > 0) g.append(' ')
            g.append(toks(j + p))
            p += 1
          }
          val c = counts.merge(g.toString, 1, (a, b) => a + b)
          if (c > best) best = c
          j += 1
        }
        (best.toDouble / m, (m - counts.size).toDouble / m)
      }
    }
    val top = gramFracs(topN)._1
    val dup = if (dupN == topN) gramFracs(topN)._2 else gramFracs(dupN)._2

    val maxTok =
      if (toks.isEmpty) 0.0
      else {
        val counts = new java.util.HashMap[String, Int](toks.length * 2)
        var best = 0
        toks.foreach { t =>
          val c = counts.merge(t, 1, (a, b) => a + b)
          if (c > best) best = c
        }
        best.toDouble / toks.length
      }

    val lines = text.split("\n", -1).filter(_.nonEmpty)
    val dupLine =
      if (lines.isEmpty) 0.0
      else {
        val distinct = new java.util.HashSet[String]()
        lines.foreach(distinct.add)
        (lines.length - distinct.size).toDouble / lines.length
      }

    org.apache.spark.sql.catalyst.InternalRow(top, dup, maxTok, dupLine)
  }
}

/** Composite quality score in ONE native pass (same formula as
  * `TextAnalysis.qualityScore`: 0.4·stopword ratio + 0.3·min(n/20,1) +
  * 0.3·min(meanLen/8,1)) — exists for the same CodegenFallback reason
  * as [[RepetitionStats]]: the built-in composition re-tokenizes per
  * reference, interpreted. */
case class QualityScoreExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quality_score expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(v: Any): Any =
    QualityScoreExpr.compute(v.asInstanceOf[UTF8String], stopSet)

  // the stopword set rides into generated code as a reference object
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet<String>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.QualityScoreExpr.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityScoreExpr =
    copy(child = newChild)
}

object QualityScoreExpr {
  def compute(s: UTF8String, stops: java.util.HashSet[String]): Double = {
    val text = s.toString
    var nToks = 0
    var nStop = 0
    var lenSum = 0L
    var tokCp = 0 // token length in CODE POINTS — the declarative form's
    // length() counts code points, and sb.length would count UTF-16
    // units (off by one per supplementary-plane letter)
    val sb = new java.lang.StringBuilder()
    def flush(): Unit = if (sb.length > 0) {
      nToks += 1
      lenSum += tokCp
      if (stops.contains(sb.toString)) nStop += 1
      sb.setLength(0)
      tokCp = 0
    }
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (RepetitionStats.isTokenCharPublic(cp)) {
        sb.appendCodePoint(Character.toLowerCase(cp))
        tokCp += 1
      } else flush()
      i += Character.charCount(cp)
    }
    flush()
    val n = nToks.toDouble
    val stopRatio = if (nToks == 0) 0.0 else nStop / n
    val lenScore = math.min(n / 20.0, 1.0)
    val meanLen = if (nToks == 0) 0.0 else lenSum / n
    val meanLenScore = math.min(meanLen / 8.0, 1.0)
    0.4 * stopRatio + 0.3 * lenScore + 0.3 * meanLenScore
  }
}

/** Token-stream stats for the Gopher rule chain in ONE native pass:
  * struct(n_words, len_sum, n_stop, n_alpha). Tokenization mirrors
  * [[QualityScoreExpr.compute]] char-for-char (same isTokenChar, same
  * lowering, code-point lengths), so the SQL replay over the regex
  * tokenizer stays hash-exact. Replaces a 4-pass higher-order-function
  * composition (tokenize + size + aggregate + filter×2 with a
  * per-token rlike) that measured ~6× slower on the bench corpus. */
case class GopherStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gopher_stats expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("len_sum", LongType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false)))
  override def prettyName: String = "gopher_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(v: Any): Any =
    GopherStatsExpr.compute(v.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet<String>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GopherStatsExpr.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

object GopherStatsExpr {
  def compute(s: UTF8String,
      stops: java.util.HashSet[String]): org.apache.spark.sql.catalyst.InternalRow = {
    val text = s.toString
    var nToks = 0
    var nStop = 0
    var nAlpha = 0
    var lenSum = 0L
    var tokCp = 0
    var tokHasAlpha = false
    val sb = new java.lang.StringBuilder()
    def flush(): Unit = if (sb.length > 0) {
      nToks += 1
      lenSum += tokCp
      if (stops.contains(sb.toString)) nStop += 1
      if (tokHasAlpha) nAlpha += 1
      sb.setLength(0)
      tokCp = 0
      tokHasAlpha = false
    }
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (RepetitionStats.isTokenCharPublic(cp)) {
        val lc = Character.toLowerCase(cp)
        sb.appendCodePoint(lc)
        tokCp += 1
        // the declarative form's token.rlike("[a-z]"): ASCII letters
        // after lowering
        if (lc >= 'a' && lc <= 'z') tokHasAlpha = true
      } else flush()
      i += Character.charCount(cp)
    }
    flush()
    org.apache.spark.sql.catalyst.InternalRow(nToks, lenSum, nStop, nAlpha)
  }
}

/** Winnowing fingerprints (Schleimer–Wilkerson–Aiken, SIGMOD'03) in
  * ONE native pass: tokenize → k-gram hashes → window-of-w minima →
  * sorted distinct array<long>. `mult = 0` hashes grams with xxhash64
  * (seed 42, byte-identical to the built-in `xxhash64` expression);
  * `mult > 0` uses [[PolyHash31]] with that multiplier (the ANSI-SQL-
  * replayable variant). Replaces a higher-order composition that was
  * CodegenFallback AND re-evaluated the gram array per reference
  * (~60 ms/doc measured — 5 minutes to fingerprint 5k docs). */
case class WinnowExpr(child: Expression, k: Int, w: Int, mult: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(v: Any): Any =
    WinnowExpr.compute(v.asInstanceOf[UTF8String], k, w, mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowExpr.compute($c, $k, $w, $mult)")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object WinnowExpr {
  def compute(s: UTF8String, k: Int, w: Int, mult: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = RepetitionStats.tokenizeText(s.toString)
    val nGrams = toks.length - k + 1
    val out = new java.util.TreeSet[java.lang.Long]()
    if (nGrams > 0) {
      val grams = new Array[Long](nGrams)
      val g = new java.lang.StringBuilder()
      var i = 0
      while (i < nGrams) {
        g.setLength(0)
        var p = 0
        while (p < k) {
          if (p > 0) g.append(' ')
          g.append(toks(i + p))
          p += 1
        }
        grams(i) =
          if (mult > 0) PolyHash31.compute(UTF8String.fromString(g.toString), mult)
          else {
            val u = UTF8String.fromString(g.toString)
            org.apache.spark.sql.catalyst.expressions.XXH64
              .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
          }
        i += 1
      }
      if (nGrams >= w) {
        i = 0
        while (i <= nGrams - w) {
          var m = grams(i)
          var j = 1
          while (j < w) { if (grams(i + j) < m) m = grams(i + j); j += 1 }
          out.add(m)
          i += 1
        }
      } else {
        var m = grams(0)
        i = 1
        while (i < nGrams) { if (grams(i) < m) m = grams(i); i += 1 }
        out.add(m)
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }
}

/** Word n-gram shingles of the TEXT in one native pass: tokenize →
  * space-joined k-grams as array<string>; empty when fewer than n
  * tokens. Same output as `Dedup.shingles(tokenize(text), n)`, which
  * is interpreted (higher-order transform + per-element slice copies)
  * and re-evaluates per reference. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any =
    WordShingles.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def compute(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = RepetitionStats.tokenizeText(s.toString)
    val m = toks.length - n + 1
    if (m <= 0)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[UTF8String])
    val out = new Array[UTF8String](m)
    val g = new java.lang.StringBuilder()
    var i = 0
    while (i < m) {
      g.setLength(0)
      var p = 0
      while (p < n) {
        if (p > 0) g.append(' ')
        g.append(toks(i + p))
        p += 1
      }
      out(i) = UTF8String.fromString(g.toString)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Order-sensitive doc fingerprint in one native pass: tokenize, then
  * fold `h = (h·31 + polyhash31(token)) mod (2^31−1)` — the native
  * form of `TextAnalysis.docFingerprintSql` (the HOF aggregate was
  * interpreted at ~1 ms/doc). */
case class PolyDocFingerprint(child: Expression, mult: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"doc_fingerprint expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint_poly"

  override def nullSafeEval(v: Any): Any =
    PolyDocFingerprint.compute(v.asInstanceOf[UTF8String], mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyDocFingerprint.compute($c, $mult)")

  override protected def withNewChildInternal(newChild: Expression): PolyDocFingerprint =
    copy(child = newChild)
}

object PolyDocFingerprint {
  def compute(s: UTF8String, mult: Int): Long = {
    val toks = RepetitionStats.tokenizeText(s.toString)
    var h = 0L
    var i = 0
    while (i < toks.length) {
      h = (h * mult + PolyHash31.compute(UTF8String.fromString(toks(i)), mult)) % 2147483647L
      i += 1
    }
    h
  }
}

/** Punctuation-character ratio in ONE native pass: code points that
  * are neither ASCII word chars (`[a-zA-Z0-9_]` — Java regex `\w`
  * without UNICODE_CHARACTER_CLASS, matching the declarative
  * `regexp_replace(text, "[\w\s]", "")` form and the RE2 oracle) nor
  * ASCII whitespace (`\s` = space, \t, \n, \x0B, \f, \r), divided by
  * total code points; 0.0 on empty input. Replaces a double regex
  * pass (match + replace + two length scans) per row.
  */
case class PunctRatioExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"punct_ratio expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "punct_ratio"

  override def nullSafeEval(v: Any): Any =
    PunctRatioExpr.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PunctRatioExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PunctRatioExpr =
    copy(child = newChild)
}

object PunctRatioExpr {
  @inline private def isWordOrSpace(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
      (cp >= '0' && cp <= '9') || cp == '_' ||
      cp == ' ' || (cp >= '\t' && cp <= '\r') // \t \n \x0B \f \r

  def compute(s: UTF8String): Double = {
    val text = s.toString
    var total = 0
    var punct = 0
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      total += 1
      if (!isWordOrSpace(cp)) punct += 1
      i += Character.charCount(cp)
    }
    if (total == 0) 0.0 else punct.toDouble / total
  }
}

/** Heuristic language id in ONE native pass: tokenize, count DISTINCT
  * tokens hitting each language's marker-word set, argmax with
  * first-language-wins ties, "unknown" on zero hits. Value-identical
  * to the `when(s > acc.s, ...)` Column fold it replaced (pinned in
  * NativeTextParitySpec) — that fold's accumulator appears twice per
  * level, so the final tree held the tokenize+array_intersect subtree
  * up to 2^(langs−1) times and conditional branches defeat
  * subexpression elimination (measured 5.1s at sf0.1 vs 0.26s for the
  * comparable native quality_score).
  */
case class LanguageIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"language_id expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "language_id"

  @transient private lazy val table = new LanguageIdExpr.MarkerTable(markers)

  override def nullSafeEval(v: Any): Any =
    LanguageIdExpr.compute(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langMarkers", table,
      "graft.functions.LanguageIdExpr.MarkerTable")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LanguageIdExpr.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): LanguageIdExpr =
    copy(child = newChild)
}

object LanguageIdExpr {
  /** Precomputed token → language-index list (a marker word may belong
    * to several languages, e.g. "que" in es and fr). */
  final class MarkerTable(markers: Seq[(String, Seq[String])]) extends Serializable {
    require(markers.nonEmpty, "graft: language_id needs at least one language")
    val langs: Array[UTF8String] =
      markers.map(m => UTF8String.fromString(m._1)).toArray
    val nLangs: Int = langs.length
    val byToken: java.util.HashMap[String, Array[Int]] = {
      val m = new java.util.HashMap[String, Array[Int]]()
      markers.zipWithIndex.foreach { case ((_, words), i) =>
        // distinct within a language: a duplicated marker word must not
        // double-count (the fold used array_intersect = set semantics)
        words.distinct.foreach { w =>
          val prev = m.get(w)
          m.put(w, if (prev == null) Array(i) else prev :+ i)
        }
      }
      m
    }
  }

  private val UNKNOWN = UTF8String.fromString("unknown")

  def compute(s: UTF8String, t: MarkerTable): UTF8String = {
    val toks = RepetitionStats.tokenizeText(s.toString)
    val hits = new Array[Int](t.nLangs)
    val seen = new java.util.HashSet[String](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val tok = toks(i)
      if (seen.add(tok)) {
        val langIdx = t.byToken.get(tok)
        if (langIdx != null) {
          var j = 0
          while (j < langIdx.length) { hits(langIdx(j)) += 1; j += 1 }
        }
      }
      i += 1
    }
    var best = 0
    var bestIdx = 0
    i = 0
    while (i < t.nLangs) {
      if (hits(i) > best) { best = hits(i); bestIdx = i } // strict >: first wins
      i += 1
    }
    if (best == 0) UNKNOWN else t.langs(bestIdx)
  }
}

object PolyHash31 {
  def compute(s: UTF8String, mult: Int): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    h
  }
}

/** Deflate compression ratio `compressed_bytes / utf8_bytes` — the
  * gzip-ratio quality signal large-scale pipelines filter on (Dolma,
  * RefinedWeb: highly repetitive or template text compresses far
  * below ~0.4; high-entropy garbage sits near or above 1.0 after
  * header overhead). One native codegen'd pass per row — the zlib
  * call dominates, so there is nothing to gain from SQL built-ins,
  * and no SQL engine replays DEFLATE: the gate is self-verifying on
  * invariants instead of oracle-hashed. Empty input → 0.0.
  */
case class DeflateRatioExpr(child: Expression, level: Int = 6)
    extends UnaryExpression {
  require(level >= 1 && level <= 9, s"graft: deflate level in [1,9], got $level")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(v: Any): Any =
    DeflateRatioExpr.compute(v.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateRatioExpr.compute($c, $level)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
}

object DeflateRatioExpr {
  def compute(s: UTF8String, level: Int): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 0.0
    val d = new java.util.zip.Deflater(level, /*nowrap=*/ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}
