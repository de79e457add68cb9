package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.text.PorterStemmer

/** Column DSL for the graft vector/text functions, mirroring
  * `org.apache.spark.sql.functions`. All functions are native Catalyst
  * expressions with whole-stage codegen — no Scala UDF overhead.
  */
package object functions {
  private def col(e: Expression): Column = GraftSqlShim.column(e)
  private def ex(c: Column): Expression = GraftSqlShim.expression(c)

  /** Squared Euclidean distance (lantern `<->`). */
  def l2sq_dist(a: Column, b: Column): Column = col(L2SqDist(ex(a), ex(b)))
  /** Cosine distance, 1 - cos similarity (lantern `<=>`). */
  def cos_dist(a: Column, b: Column): Column = col(CosDist(ex(a), ex(b)))
  /** Bit-level hamming distance over packed int arrays (lantern `<+>`). */
  def hamming_dist(a: Column, b: Column): Column = col(HammingDist(ex(a), ex(b)))
  /** Dot product. */
  def inner_product(a: Column, b: Column): Column = col(InnerProduct(ex(a), ex(b)))
  /** Euclidean norm. */
  def vector_norm(a: Column): Column = col(L2Norm(ex(a)))
  /** Dot product of two sparse vectors — each a
    * `struct<indices: array<int>, values: array<float>>` with sorted
    * indices (sorted-merge over shared coordinates). */
  def sparse_dot(a: Column, b: Column): Column = col(SparseDot(ex(a), ex(b)))

  // ---------------------------------------------------------------- text

  import org.apache.spark.sql.functions.{array_contains => sqlArrayContains, filter => sqlFilter, length => sqlLength, lit, lower, regexp_replace, split, transform => sqlTransform, typedlit}

  /** Snowball-English stem of one lowercase token. */
  def stem_word(c: Column): Column = col(StemWord(ex(c)))

  /** Lowercase + split on non-alphanumeric runs → array of tokens.
    * Mirrors the reference tokenizer (stemmers.rs:105-110): every
    * non-alphanumeric char becomes a separator, empty tokens dropped.
    * Native single-pass expression (see [[TokenizeExpr]]); the
    * declarative regex form it replaced is pinned as its parity oracle
    * in NativeTextParitySpec. */
  def tokenize(c: Column): Column =
    org.apache.spark.sql.graftshim.GraftSqlShim.column(
      TokenizeExpr(org.apache.spark.sql.graftshim.GraftSqlShim.expression(c)))

  /** Lookahead-free GPT-2-style pre-tokenizer pattern (contractions,
    * space-prefixed letter/digit/punct runs, whitespace runs). The
    * published GPT-2 regex minus its `(?!\S)` lookahead, so the SAME
    * pattern runs identically on Java regex and RE2 (DuckDB) — the
    * "BPE-ish" token counter for data pipelines.
    */
  val BpePretokenizePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Split text into BPE-style pre-tokens (array<string>). */
  def bpe_pretokenize(c: Column): Column = {
    import org.apache.spark.sql.functions.regexp_extract_all
    regexp_extract_all(c, lit(BpePretokenizePattern), lit(0))
  }

  /** tokenize → stem each token → drop stopwords (applied post-stem,
    * like the reference). `text_to_stem_array` in lantern
    * (lantern_extras/src/stemmers.rs:95-152). */
  def text_to_stem_array(
      c: Column,
      stopwords: Seq[String] = PorterStemmer.defaultStopwords.toSeq): Column =
    org.apache.spark.sql.graftshim.GraftSqlShim.column(
      StemTokensExpr(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(c), stopwords))

  /** SQL-reproducible polynomial hash (see [[PolyHash31]]) — used by
    * the oracle-checked variants of hash-derived operators. */
  def polyhash31(c: Column, mult: Int = 31): Column =
    org.apache.spark.sql.graftshim.GraftSqlShim.column(
      PolyHash31(org.apache.spark.sql.graftshim.GraftSqlShim.expression(c), mult))

  // --------------------------------------------------------------- bloom

  import org.apache.spark.sql.functions.udf

  /** Build a serialized bloom filter (fpp 0.01) over an array of ids —
    * `array_to_bloom` (lantern_extras/src/bloom.rs:46-92). */
  val array_to_bloom: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { ids: Seq[Long] => graft.text.Bm25.bloomBytes(ids) }

  /** Membership probe — `elem_in_bloom` (bloom.rs:93-103). */
  val elem_in_bloom: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long, bytes: Array[Byte]) => graft.text.Bm25.bloomContains(bytes, id) }

  /** Register every graft function for SQL use (idempotent). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("l2sq_dist", es => L2SqDist(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("cos_dist", es => CosDist(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("hamming_dist", es => HammingDist(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("inner_product", es => InnerProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vector_norm", es => L2Norm(es(0)), "built-in")
    reg.createOrReplaceTempFunction("stem", es => StemWord(es(0)), "built-in")
    reg.createOrReplaceTempFunction("polyhash31",
      es => PolyHash31(es(0), 31), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      es => WordShingles(es(0),
        es(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("repetition_stats",
      es => RepetitionStats(es(0), 2, 3), "built-in")
    reg.createOrReplaceTempFunction("winnow_fingerprints",
      es => WinnowExpr(es(0), 3, 4, 0), "built-in")
    reg.createOrReplaceTempFunction("ngram_keys",
      es => graft.text.NgramKeys(es(0)), "built-in")
    reg.createOrReplaceTempFunction("rolling_hashes",
      es => graft.ops.RollingHashes(es(0),
        es(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("nfc_normalize",
      es => graft.ops.NfcNormalize(es(0)), "built-in")
    reg.createOrReplaceTempFunction("gopher_stats",
      es => GopherStatsExpr(es(0),
        Seq("the", "and", "of", "to", "a", "in", "is", "it")), "built-in")
  }
}
