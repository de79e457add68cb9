package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Document preparation for RAG / training pipelines: token-window
  * chunking, unicode cleanup, sentence splitting. All semantics are
  * deterministic and ANSI-SQL-replayable, and every transform is a
  * map-side projection — no shuffles beyond the chunk explode itself,
  * so each scales linearly with corpus bytes.
  *
  * Reference context: the reference engine embeds caller-provided
  * rows as-is (`lantern_cli/src/embeddings/`); chunking/cleanup is the
  * upstream step its users run before `create-embeddings`, added here
  * as part of the training-data stack.
  */
object TextPrep {

  /** Whitespace tokens (punctuation stays attached — the chunker's
    * unit is "words", not the BM25 term pipeline). */
  private def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Sliding token-window chunks: `(idCol, chunk_id, n_tokens,
    * chunk_text)`. Windows are `maxTokens` wide at stride
    * `maxTokens − overlap`; the last window may be shorter; every
    * token is covered; token-free docs produce no rows. Chunk text is
    * the space-joined window (whitespace runs normalize to one space —
    * the usual embedding-input normalization). */
  def chunkByTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      overlap: Int): DataFrame = {
    require(maxTokens >= 1, s"graft: maxTokens must be ≥1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"graft: overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    val d = docs
      .select(col(idCol), wsTokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
    d
      .withColumn("__nchunks",
        when(col("__n") <= 0, 0)
          .when(col("__n") <= maxTokens, 1)
          .otherwise(lit(1) +
            floor((col("__n") - maxTokens + (stride - 1)).cast("double") / stride)
              .cast("int")))
      .withColumn("chunk_id", explode(when(col("__nchunks") > 0,
        sequence(lit(0), col("__nchunks") - 1))
        .otherwise(array().cast("array<int>"))))
      .withColumn("__start", col("chunk_id") * stride + 1)
      .select(
        col(idCol),
        col("chunk_id"),
        least(lit(maxTokens), col("__n") - col("__start") + 1).as("n_tokens"),
        array_join(slice(col("__toks"), col("__start"), lit(maxTokens)), " ")
          .as("chunk_text"))
  }

  /** Unicode cleanup: NFC-normalize, drop zero-width characters
    * (ZWSP/ZWNJ/ZWJ/BOM), map NBSP to a plain space, and strip the
    * remaining C0/C1 control characters (tab and newline survive).
    * Exactly these four rules, in this order, so the transform replays
    * in SQL as `nfc_normalize` + three `regexp_replace` calls. */
  def cleanText(text: Column): Column = {
    val nfc = GraftSqlShim.column(NfcNormalize(GraftSqlShim.expression(text)))
    val noZw = regexp_replace(nfc, "[\\u200B\\u200C\\u200D\\uFEFF]", "")
    val nbsp = regexp_replace(noZw, "\\u00A0", " ")
    regexp_replace(nbsp, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]", "")
  }

  /** Collapse CONSECUTIVE duplicate lines per document (the
    * RefinedWeb/Gopher within-doc repetition cleanup — boilerplate
    * menus and nav bars repeat adjacently): `(idCol, text_clean)`.
    * The line array is projected into its own column first so the
    * indexed `filter` reads a bound attribute (O(1) per element) —
    * capturing the raw `split` expression would re-evaluate it per
    * element. */
  def collapseRepeatedLines(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__ls", split(col(textCol), "\n"))
      .select(col(idCol),
        array_join(
          filter(col("__ls"),
            (x, i) => (i === 0) || (x =!= element_at(col("__ls"), i))),
          "\n").as("text_clean"))

  /** Rule-based sentence split: maximal runs of non-terminator text
    * followed by their `[.!?]+` terminators (a trailing fragment
    * without a terminator is its own sentence), trimmed, empties
    * dropped. Lookaround-free, so the same pattern runs on Java regex
    * and RE2. Returns `(idCol, sent_id, sentence)`. */
  def sentenceSplit(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol),
        posexplode(filter(
          transform(
            regexp_extract_all(col(textCol),
              lit("[^.!?]+[.!?]+|[^.!?]+$"), lit(0)),
            s => trim(s)),
          s => s =!= "")).as(Seq("sent_id", "sentence")))
}

/** Unicode NFC normalization (java.text.Normalizer — in the JDK, zero
  * new dependencies; DuckDB's `nfc_normalize` is the oracle replay).
  * Pure per-row projection, codegen-friendly. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: NFC-normal already (all ASCII is)
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
