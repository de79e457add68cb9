package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.tokenize

/** Byte-pair-encoding merge learning (Sennrich, Haddow & Birch,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016) — the tokenizer-TRAINING step of a data pipeline,
  * word-internal (the subword-nmt / GPT-2 shape: merges never cross
  * word boundaries).
  *
  * Semantics (deterministic):
  *  - the corpus reduces to WORD COUNTS (tokenize → groupBy) — the
  *    only corpus-sized pass;
  *  - each round counts adjacent symbol pairs weighted by word count
  *    (overlaps count: "aaa" contributes (a,a) twice), picks the most
  *    frequent pair — ties → lexicographically smallest (left, right)
  *    — and merges it greedily left-to-right in every word;
  *  - training stops after `numMerges` rounds or when no pair repeats.
  *
  * Scale shape: word counts aggregate distributedly; the vocabulary
  * (distinct words) is bounded by the language, not the corpus, so the
  * FAST path collects it under `spark.graft.bpe.maxDriverVocab` and
  * runs the classic in-memory loop. Above the budget, each round runs
  * as one pair-count aggregate over the words frame plus a map-side
  * codegen'd [[MergePairExpr]] rewrite (localCheckpoint every few
  * rounds keeps the lineage flat). Both regimes produce IDENTICAL
  * merge tables (spec-asserted).
  */
object BpeTrainer {

  case class Merge(rank: Int, left: String, right: String)

  val MaxDriverVocabKey = "spark.graft.bpe.maxDriverVocab"

  /** `(word, cnt)` — the corpus's only full-size pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .where(col(textCol).isNotNull)
      .select(explode(tokenize(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    val budget = spark.conf.getOption(MaxDriverVocabKey)
      .map(_.toLong).getOrElse(5000000L)
    val words = wordCounts(docs, textCol)
    if (words.count() <= budget) {
      val rows = words.collect().map(r => (r.getString(0), r.getLong(1)))
      trainLocal(rows, numMerges)
    } else trainDistributed(words, numMerges)
  }

  /** Split a word into code-point symbols. Code points, not UTF-16
    * code units: lone surrogates are invalid UTF-8, so code-unit
    * symbols would make UTF8String ordering (the distributed
    * tie-break) ill-defined for supplementary characters. */
  private[text] def charSyms(w: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** UTF-8 byte comparison — EXACTLY Spark's UTF8String binary sort,
    * which the distributed regime's orderBy tie-break uses. Java
    * String `<` is UTF-16 code-unit order and disagrees for
    * U+E000–U+FFFF vs supplementary characters. */
  private[text] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Classic in-memory loop over the collected vocabulary. */
  private[text] def trainLocal(
      vocab: Array[(String, Long)], numMerges: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (charSyms(w), c) }
    val merges = mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    while (rank < numMerges) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      var bestK: (String, String) = null
      var bestC = 0L
      counts.foreach { case (k, c) =>
        if (c >= 2) {
          val better =
            if (bestK == null) true
            else if (c != bestC) c > bestC
            else if (k._1 != bestK._1) utf8Less(k._1, bestK._1)
            else utf8Less(k._2, bestK._2)
          if (better) { bestK = k; bestC = c }
        }
      }
      if (bestK == null) return merges.toSeq
      val (l, r) = bestK
      merges += Merge(rank, l, r)
      words = words.map { case (syms, c) => (mergeOnce(syms, l, r), c) }
      rank += 1
    }
    merges.toSeq
  }

  /** One greedy left-to-right merge pass (shared by both regimes and
    * the tokenizer). */
  private[text] def mergeOnce(
      syms: Array[String], l: String, r: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Distributed regime: the words frame never leaves the cluster;
    * each round is one 2-column pair aggregate + a top-1 collect.
    * Public so callers (and the cross-regime gate) can force it. */
  def trainDistributed(
      wordsDf: DataFrame, numMerges: Int): Seq[Merge] = {
    import org.apache.spark.sql.functions.{split => _, _}
    var words = wordsDf
      .select(GraftSqlShim.column(CharsExpr(
        GraftSqlShim.expression(col("word")))).as("syms"), col("cnt"))
      .localCheckpoint()
    val merges = mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    while (rank < numMerges) {
      val best = words
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
          slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .where(col("n") >= 2)
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (best.isEmpty) return merges.toSeq
      val (l, r) = (best.head.getString(0), best.head.getString(1))
      merges += Merge(rank, l, r)
      words = words.select(GraftSqlShim.column(MergePairExpr(
        GraftSqlShim.expression(col("syms")), l, r)).as("syms"), col("cnt"))
      if (rank % 8 == 7) words = words.localCheckpoint()
      rank += 1
    }
    merges.toSeq
  }

  /** Tokenize a word with a learned merge table (merges applied in
    * rank order, each greedy left-to-right — exactly the training
    * rewrite, so training words round-trip). */
  def applyMerges(word: String, merges: Seq[Merge]): Array[String] = {
    var syms = charSyms(word)
    merges.foreach(m => syms = mergeOnce(syms, m.left, m.right))
    syms
  }

  /** Column form: text → tokenize → per-word BPE symbols, flattened.
    * One codegen'd pass against the broadcast-as-literal merge table. */
  def bpeTokens(text: Column, merges: Seq[Merge]): Column =
    GraftSqlShim.column(BpeApplyExpr(
      GraftSqlShim.expression(text),
      merges.map(m => (m.left, m.right)).toArray))

  /** The distinct single-char alphabet of the tokenized corpus — one
    * explode + distinct, collected (alphabets are tiny: ≤ charset). */
  def corpusAlphabet(docs: DataFrame, textCol: String): Seq[String] =
    docs.where(col(textCol).isNotNull)
      .select(explode(tokenize(col(textCol))).as("w"))
      .select(explode(GraftSqlShim.column(CharsExpr(
        GraftSqlShim.expression(col("w"))))).as("c"))
      .distinct().collect().map(_.getString(0)).toSeq

  /** Dense token-id table: sorted alphabet first, then merge products
    * in rank order (the GPT-2 vocab layout shape). Distinct-first wins
    * when two merges concatenate to the same string. */
  def vocabulary(merges: Seq[Merge], alphabet: Seq[String]): Map[String, Int] =
    (alphabet.distinct.sorted ++ merges.sortBy(_.rank).map(m => m.left + m.right))
      .distinct.zipWithIndex.toMap

  /** text → BPE token ids in one projection: [[bpeTokens]] then a
    * map-literal lookup (`element_at` on a MapType literal — a single
    * broadcast-with-the-plan object, fine at real vocab sizes).
    * Unknown symbols (chars outside the vocab alphabet) encode as -1
    * so downstream can count OOV instead of silently dropping. */
  def encodeIds(
      text: Column, merges: Seq[Merge], vocab: Map[String, Int]): Column = {
    val vmap = typedLit(vocab)
    transform(bpeTokens(text, merges),
      t => coalesce(element_at(vmap, t), lit(-1)))
  }

  // ----------------------------------------------------------------
  // BYTE-LEVEL regime (GPT-2 style): pretokenize with the published
  // regex (spaces ride with their word), atomize each pretoken to its
  // UTF-8 BYTES (one latin-1 char per byte — reversible), merge over
  // bytes. The alphabet is ≤ 256 by construction, so NO text — any
  // language, emoji, binary junk — is ever out-of-vocabulary, and
  // token streams decode back to the exact original bytes.
  // ----------------------------------------------------------------

  /** UTF-8 bytes of `s` as one latin-1 char per byte (reversible). */
  private[text] def toByteString(s: String): String = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(b.length)
    b.foreach(x => sb.append((x & 0xff).toChar))
    sb.toString
  }

  private[text] def fromByteString(s: String): String = {
    val b = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) { b(i) = s.charAt(i).toByte; i += 1 }
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** (byte-string pretoken, cnt) — built-ins only: the UTF-8 →
    * latin-1 byte view is `decode(encode(w, 'UTF-8'), 'ISO-8859-1')`. */
  def byteWordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .where(col(textCol).isNotNull)
      .select(explode(graft.functions.bpe_pretokenize(col(textCol))).as("w0"))
      .select(decode(encode(col("w0"), "UTF-8"), "ISO-8859-1").as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Byte-level merge learning — same budget-gated regimes as [[train]],
    * over the byte-string vocabulary. */
  def trainBytes(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    val budget = spark.conf.getOption(MaxDriverVocabKey)
      .map(_.toLong).getOrElse(5000000L)
    val words = byteWordCounts(docs, textCol)
    if (words.count() <= budget) {
      val rows = words.collect().map(r => (r.getString(0), r.getLong(1)))
      trainLocal(rows, numMerges)
    } else trainDistributed(words, numMerges)
  }

  /** Column form: text → GPT-2 pretokens → byte symbols → merges, one
    * codegen'd pass. Tokens are latin-1 byte strings; their in-order
    * concatenation decodes to the exact original text
    * (`decode(encode(concat, 'ISO-8859-1'), 'UTF-8')`). */
  def byteBpeTokens(text: Column, merges: Seq[Merge]): Column =
    GraftSqlShim.column(ByteBpeApplyExpr(
      GraftSqlShim.expression(text),
      merges.map(m => (m.left, m.right)).toArray))
}

/** String → array of single-code-point symbols (the training
  * alphabet). Code points, not UTF-16 code units — see
  * [[BpeTrainer.charSyms]]. */
case class CharsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"chars expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "chars"
  override def nullSafeEval(v: Any): Any =
    CharsExpr.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.CharsExpr.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): CharsExpr =
    copy(child = newChild)
}

object CharsExpr {
  def compute(s: UTF8String): ArrayData = {
    val syms = BpeTrainer.charSyms(s.toString)
    val out = new Array[AnyRef](syms.length)
    var i = 0
    while (i < syms.length) {
      out(i) = UTF8String.fromString(syms(i)); i += 1
    }
    new GenericArrayData(out)
  }
}

/** One greedy left-to-right merge of (left, right) in a symbol array —
  * the distributed regime's per-round rewrite. */
case class MergePairExpr(child: Expression, left: String, right: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"merge_pair expects array<string>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "merge_pair"
  override def nullSafeEval(v: Any): Any =
    MergePairExpr.compute(v.asInstanceOf[ArrayData],
      UTF8String.fromString(left), UTF8String.fromString(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("mpLeft", UTF8String.fromString(left),
      "org.apache.spark.unsafe.types.UTF8String")
    val r = ctx.addReferenceObj("mpRight", UTF8String.fromString(right),
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.text.MergePairExpr.compute($c, $l, $r)")
  }
  override protected def withNewChildInternal(newChild: Expression): MergePairExpr =
    copy(child = newChild)
}

object MergePairExpr {
  def compute(arr: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new mutable.ArrayBuffer[AnyRef](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && arr.getUTF8String(i) == l && arr.getUTF8String(i + 1) == r) {
        out += UTF8String.concat(l, r); i += 2
      } else { out += arr.getUTF8String(i); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }
}

/** text → tokenize → per-word BPE (full merge table, rank order) →
  * flattened symbol array. */
case class BpeApplyExpr(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"
  override def nullSafeEval(v: Any): Any =
    BpeApplyExpr.compute(v.asInstanceOf[UTF8String], merges)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMerges", merges, "scala.Tuple2[]")
    defineCodeGen(ctx, ev, c => s"graft.text.BpeApplyExpr.compute($c, $m)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeApplyExpr =
    copy(child = newChild)
}

object BpeApplyExpr {
  def compute(s: UTF8String, merges: Array[(String, String)]): ArrayData = {
    val toks = graft.functions.WordShingles.compute(s, 1)
    val out = new mutable.ArrayBuffer[AnyRef]()
    var t = 0
    val n = toks.numElements()
    while (t < n) {
      var syms = BpeTrainer.charSyms(toks.getUTF8String(t).toString)
      var i = 0
      while (i < merges.length) {
        syms = BpeTrainer.mergeOnce(syms, merges(i)._1, merges(i)._2)
        i += 1
      }
      syms.foreach(x => out += UTF8String.fromString(x))
      t += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Byte-level BPE tokenization: GPT-2 regex pretokens → UTF-8 byte
  * symbols (latin-1 chars) → rank-ordered merges. Codegen'd. */
case class ByteBpeApplyExpr(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"byte_bpe_apply expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "byte_bpe_apply"
  override def nullSafeEval(v: Any): Any =
    ByteBpeApplyExpr.compute(v.asInstanceOf[UTF8String], merges)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("merges", merges, "scala.Tuple2[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.text.ByteBpeApplyExpr.compute($c, (scala.Tuple2[]) $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): ByteBpeApplyExpr =
    copy(child = newChild)
}

object ByteBpeApplyExpr {
  private val pretokenizer =
    java.util.regex.Pattern.compile(graft.functions.BpePretokenizePattern)

  def compute(s: UTF8String, merges: Array[(String, String)]): ArrayData = {
    val text = s.toString
    val out = new mutable.ArrayBuffer[AnyRef]()
    val m = pretokenizer.matcher(text)
    while (m.find()) {
      var syms = BpeTrainer.toByteString(m.group()).map(_.toString).toArray
      var i = 0
      while (i < merges.length) {
        syms = BpeTrainer.mergeOnce(syms, merges(i)._1, merges(i)._2)
        i += 1
      }
      syms.foreach(x => out += UTF8String.fromString(x))
    }
    new GenericArrayData(out.toArray)
  }
}
