package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact substring deduplication — remove every character span whose
  * `minLen`-gram content appears more than once in the corpus, keeping
  * only the globally-first occurrence (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022 — the
  * suffix-array ExactSubstr dedup, re-expressed for Spark).
  *
  * Reference context: the reference engine's text stack stops at
  * token/shingle granularity (`lantern_extras/src/bm25_agg.rs` term
  * pipeline); character-level duplicated-span removal is the missing
  * training-data op this module adds on top of [[Dedup]]'s
  * document-level families.
  *
  * Semantics (deterministic, oracle-replayable):
  *  - a WINDOW is any `minLen`-char substring at stride 1;
  *  - a window is DUPLICATED when the identical string occurs at ≥2
  *    distinct (doc, pos) sites corpus-wide;
  *  - the canonical site of each distinct duplicated gram — the
  *    lexicographically-first (doc_id, pos) — is KEPT; every other
  *    site marks its `[pos, pos+minLen-1]` chars for removal;
  *  - per doc, marked windows merge when overlapping OR exactly
  *    adjacent (`start ≤ prevEnd + 1`) into maximal spans.
  *
  * Scale shape (the 100 TB question — total positions ≈ total chars,
  * so the design never shuffles gram text corpus-wide):
  *  1. NARROW pass: [[RollingHashes]] emits every window's 64-bit
  *     polynomial hash in ONE O(len) pass per doc (the per-position
  *     `substr`+`xxhash64` form costs O(len·minLen) re-scans plus a
  *     40-byte allocation per window), and the 8-byte hashes
  *     hash-aggregate with map-side combine to the duplicated-hash
  *     set. Shuffle width: 8-byte key + partial count.
  *  2. CANDIDATE pass: `(doc_id, pos, h)` triples — never the text —
  *     join the duplicated-hash set (AQE turns it into a broadcast
  *     probe when it fits), and only the few-percent survivors re-join
  *     `docs` by doc_id to re-materialize their gram text for the
  *     EXACT group-by-gram verdict. Hash collisions therefore cannot
  *     create false dups (collided distinct grams fail the `gram`
  *     grouping below) and cannot drop dups (same grams share a hash).
  *  3. Canonical pick: windows partitioned by `(h, gram)` — identical
  *     grouping to `gram` alone (equal grams hash equal), but the
  *     exchange and sort run on the 8-byte hash first and compare the
  *     gram string only within hash-equal runs.
  *  4. Span merge: per-doc gaps-and-islands over the window starts —
  *     one shuffle keyed by doc_id of the duplicated sites only.
  *
  * Very large single documents should be pre-chunked upstream (the
  * per-row window-hash array is O(doc length) transient memory — same
  * caveat as any explode-based shape).
  */
object SubstringDedup {

  private def rollingHashes(text: org.apache.spark.sql.Column, n: Int) =
    GraftSqlShim.column(RollingHashes(GraftSqlShim.expression(text), n))

  /** Duplicated-window sites with their canonical-occurrence flag:
    * `(doc_id, pos, keep)` — one row per (doc, pos) site of a gram
    * that occurs ≥2 times corpus-wide; `keep` marks the single
    * lexicographically-first site of each distinct gram. */
  def duplicatedWindows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int): DataFrame = {
    require(minLen >= 2, s"graft: minLen must be ≥2, got $minLen")
    val d = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("__text"))

    // pass 1: narrow hash-only aggregation → duplicated-hash set
    val dupHashes = d
      .select(explode(rollingHashes(col("__text"), minLen)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"))
      .where(col("n") > 1)
      .select("h")

    // pass 2: narrow (doc_id, pos, h) triples probe the dup set; only
    // survivors fetch their text back (join by doc_id) and cut the
    // gram for the exact verdict
    val sites = d
      .select(col("doc_id"),
        posexplode(rollingHashes(col("__text"), minLen)).as(Seq("pos0", "h")))
      .join(dupHashes, "h")
    val cand = sites
      .join(d, "doc_id")
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"),
        col("__text").substr(col("pos0") + 1, lit(minLen)).as("gram"))

    val w = Window.partitionBy("h", "gram").orderBy("doc_id", "pos")
    cand
      .withColumn("rn", row_number().over(w))
      .withColumn("sites", count(lit(1)).over(Window.partitionBy("h", "gram")))
      .where(col("sites") > 1)
      .select(col("doc_id"), col("pos"), (col("rn") === 1).as("keep"))
  }

  /** Merged removal spans: `(doc_id, span_start, span_end)`, 1-based
    * inclusive character intervals, overlapping-or-adjacent windows
    * coalesced. Only non-canonical duplicated sites contribute. */
  def duplicatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int): DataFrame = {
    val wins = duplicatedWindows(docs, idCol, textCol, minLen)
      .where(!col("keep"))
      .select(col("doc_id"), col("pos").cast("long").as("s"),
        (col("pos") + minLen - 1).cast("long").as("e"))
    val byDoc = Window.partitionBy("doc_id").orderBy("s", "e")
    val runMax = max(col("e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    wins
      .withColumn("brk",
        when(col("s") > coalesce(runMax, lit(-1L)) + 1, 1).otherwise(0))
      .withColumn("island",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** Every input row with duplicated spans cut out: `(doc_id,
    * text_clean)`. Docs with nothing removed pass through verbatim.
    * The cut is a per-row fold over that doc's few merged spans
    * (collect_list per doc — bounded by doc_len/minLen), built from
    * codegen'd string primitives: complement the sorted span array
    * into kept segments, substring each, concat. */
  def removeDuplicated(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int): DataFrame = {
    val spans = duplicatedSpans(docs, idCol, textCol, minLen)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e")))).as("__spans"))
    val d = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("__text"))
    val joined = d.join(spans, Seq("doc_id"), "left")
      .withColumn("__spans",
        coalesce(col("__spans"),
          array().cast("array<struct<s:bigint,e:bigint>>")))
    // kept segments = gaps between consecutive spans plus the tail:
    // zip previous-ends (0, e1, e2, …) with next-starts (s1, …, len+1)
    val prevEnds = concat(array(lit(0L)),
      transform(col("__spans"), sp => sp.getField("e")))
    val nextStarts = concat(
      transform(col("__spans"), sp => sp.getField("s")),
      array(length(col("__text")).cast("long") + 1))
    val segs = filter(
      zip_with(prevEnds, nextStarts,
        (pe, ns) => struct((pe + 1).as("s"), (ns - 1).as("e"))),
      sg => sg.getField("e") >= sg.getField("s"))
    joined
      .withColumn("text_clean",
        concat_ws("", transform(segs,
          sg => col("__text").substr(
            sg.getField("s"),
            sg.getField("e") - sg.getField("s") + 1))))
      .select(col("doc_id"), col("text_clean"))
  }
}

/** 64-bit polynomial rolling hashes of every stride-1 `n`-code-point
  * window of a string, computed in one O(len) pass: element i is
  * `Σ cp[i+j]·B^(n-1-j)` over wrapping long arithmetic (B odd ⇒ the
  * map over windows is far from degenerate; collisions are harmless —
  * callers verify on the gram string). Returns an empty array when the
  * text has fewer than `n` code points; 1-based window p starts at
  * array index p-1, matching `substr(text, p, n)` code-point
  * semantics. */
case class RollingHashes(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_hashes expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hashes"

  override def nullSafeEval(v: Any): Any =
    RollingHashes.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.RollingHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}

object RollingHashes {
  /** Odd multiplier (splitmix64's golden-gamma) — full-period under
    * wrapping 64-bit multiplication. */
  val Base: Long = 0x9e3779b97f4a7c15L

  def compute(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val sl = str.length
    var cpCount = 0
    var i = 0
    while (i < sl) { i += Character.charCount(str.codePointAt(i)); cpCount += 1 }
    val m = cpCount - n + 1
    if (m <= 0) return ArrayData.toArrayData(Array.empty[Long])
    val cps = new Array[Int](cpCount)
    i = 0; var j = 0
    while (i < sl) {
      val cp = str.codePointAt(i)
      cps(j) = cp; j += 1
      i += Character.charCount(cp)
    }
    // B^(n-1) for the roll-out term
    var topPow = 1L
    i = 0
    while (i < n - 1) { topPow *= Base; i += 1 }
    val out = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < n) { h = h * Base + cps(i); i += 1 }
    out(0) = h
    i = 1
    while (i < m) {
      h = (h - cps(i - 1) * topPow) * Base + cps(i + n - 1)
      out(i) = h
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
