package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *  1. NARROW pass: project each position to its 64-bit `xxhash64`
  *     gram hash only (substring+hash fused in one codegen'd map
  *     stage; the wide `text` column never reaches the exchange) and
  *     hash-aggregate to the duplicated-hash set. Shuffle width: 8-byte
  *     key + partial count, with map-side combine.
  *  2. CANDIDATE pass: positions semi-join the duplicated-hash set
  *     (broadcast when it fits `autoBroadcastJoinThreshold`, shuffle
  *     hash-join otherwise — Spark picks from stats), and only these
  *     few-percent survivors re-materialize their gram text for the
  *     EXACT group-by-gram verdict. Hash collisions therefore cannot
  *     create false dups (collided distinct grams fail `count>1` on
  *     the gram itself) and cannot drop dups (same grams share a hash).
  *  3. Span merge: per-doc gaps-and-islands over the window starts —
  *     one shuffle keyed by doc_id of the duplicated sites only.
  *
  * Very large single documents should be pre-chunked upstream (the
  * per-row `sequence()` position array is O(doc length) transient
  * memory — same caveat as any explode-based shape).
  */
object SubstringDedup {

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
    // stride-1 window starts; guard short docs (Spark's sequence(1,0)
    // would DESCEND, not return empty)
    val positions = d
      .withColumn("pos", explode(when(
        length(col("__text")) >= minLen,
        sequence(lit(1), length(col("__text")) - (minLen - 1)))
        .otherwise(array().cast("array<int>"))))
    val gram = col("__text").substr(col("pos"), lit(minLen))

    // pass 1: narrow hash-only aggregation → duplicated-hash set
    val dupHashes = positions
      .select(xxhash64(gram).as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"))
      .where(col("n") > 1)
      .select("h")

    // pass 2: candidate sites only re-carry gram text; exact verdict
    // and canonical pick group by the gram STRING, so hash collisions
    // are harmless
    val cand = positions
      .withColumn("h", xxhash64(gram))
      .join(dupHashes, "h")
      .select(col("doc_id"), col("pos"), gram.as("gram"))
    val w = Window.partitionBy("gram").orderBy("doc_id", "pos")
    cand
      .withColumn("rn", row_number().over(w))
      .withColumn("sites", count(lit(1)).over(Window.partitionBy("gram")))
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
