package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions._
import graft.ops.Dedup
import graft.text.TextAnalysis

/** Driver-checkable queries for the training-data pipeline surface:
  * dedup (exact / MinHash-LSH / SimHash / n-gram jaccard / embedding
  * cosine), language id, quality scoring, fingerprinting.
  */
object PipelineQueries {

  // ------------------------------------------------------------- dedup

  private def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDupGroups(Tables.documents(s, dir), "doc_id", Seq("text"))
      .orderBy(col("keeper_id"))

  /** MinHash LSH candidates verified at jaccard >= 0.8 over distinct
    * tokens. Oracle = exhaustive O(n²) jaccard in DuckDB (the corpus
    * is 500 docs; LSH at 32×4 bands has miss prob < 1e-7 per pair and
    * fixed seeds, verified empirically to find the identical set). */
  private def dedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), tokenize(col("text")).as("toks"))
    Dedup.minhashNearDupPairs(docs, "doc_id", "toks", 0.8)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val dedupMinhashOracle =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS toks
      |  FROM documents
      |)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(len(list_intersect(a.toks, b.toks)) * 1.0
      |        / len(list_distinct(a.toks || b.toks)), 4) AS jaccard
      |FROM t a JOIN t b ON a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.toks, b.toks)) * 1.0
      |      / len(list_distinct(a.toks || b.toks)) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  /** Cross-corpus fuzzy dedup: ingest-side docs (doc_id % 3 ≠ 0)
    * matched against the existing corpus (doc_id % 3 = 0); oracle =
    * exhaustive cross-side jaccard. */
  private def dedupCross(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), tokenize(col("text")).as("toks"))
    Dedup.crossMinhashMatches(
      docs.where(col("doc_id") % 3 =!= 0),
      docs.where(col("doc_id") % 3 === 0),
      "doc_id", "toks", 0.8)
      .select(col("new_id"), col("ref_id"),
        round(col("jaccard"), 4).as("jaccard"))
      .orderBy("new_id", "ref_id")
  }

  private val dedupCrossOracle =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS toks
      |  FROM documents
      |)
      |SELECT n.doc_id AS new_id, r.doc_id AS ref_id,
      |  round(len(list_intersect(n.toks, r.toks)) * 1.0
      |        / len(list_distinct(n.toks || r.toks)), 4) AS jaccard
      |FROM t n JOIN t r ON n.doc_id % 3 <> 0 AND r.doc_id % 3 = 0
      |WHERE len(list_intersect(n.toks, r.toks)) * 1.0
      |      / len(list_distinct(n.toks || r.toks)) >= 0.8
      |ORDER BY new_id, ref_id""".stripMargin

  private def dedupCrossKeep(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), tokenize(col("text")).as("toks"))
    Dedup.crossDedupKeep(
      docs.where(col("doc_id") % 3 =!= 0),
      docs.where(col("doc_id") % 3 === 0),
      "doc_id", "toks", 0.8)
      .select(col("doc_id"))
      .orderBy("doc_id")
  }

  private val dedupCrossKeepOracle =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS toks
      |  FROM documents
      |)
      |SELECT n.doc_id
      |FROM t n
      |WHERE n.doc_id % 3 <> 0 AND NOT EXISTS (
      |  SELECT 1 FROM t r WHERE r.doc_id % 3 = 0
      |  AND len(list_intersect(n.toks, r.toks)) * 1.0
      |      / len(list_distinct(n.toks || r.toks)) >= 0.8)
      |ORDER BY doc_id""".stripMargin

  /** Dedup DECISIONS (keeper per doc) — the linear-output form that is
    * the actual 100 TB dedup path (a mega duplicate cluster is one
    * label per member, not O(n²) pairs). Oracle = connected components
    * of the exhaustive jaccard graph via a recursive CTE. */
  private def dedupMinhashKeepers(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), tokenize(col("text")).as("toks"))
    Dedup.minhashDedupKeepers(docs, "doc_id", "toks", 0.8)
      .select(col("id").as("doc_id"), col("keeper_id"))
      .orderBy(col("doc_id"))
  }

  /** The keepers SCALE regime, driver-gated: forces
    * `broadcastBytes = 0` so [[Dedup.bigBucketStarEdges]] + the blocked
    * chunk verifier — the actual 100 TB code path — produce the
    * keepers, and lowers maxBucket/leftoverPairBudget so star rounds
    * genuinely run at BOTH gate scales (at defaults, sf0.01's clusters
    * are under the 1000-member bucket cutoff and the whole corpus fits
    * the initial pair budget, so the scale branches would be dead
    * code). Must equal [[dedupMinhashKeepers]] row-for-row — same
    * recursive-CTE oracle. The regime flip happens eagerly inside
    * minhashDedupKeepers (the byte-budget head() runs at build time),
    * so restoring the conf after building the frame is safe.
    */
  private def dedupMinhashKeepersScale(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), tokenize(col("text")).as("toks"))
    val key = graft.GraftConf.DedupBroadcastBytes
    val saved = s.conf.getOption(key)
    s.conf.set(key, "0")
    try {
      // budgets chosen so the scale branches run at BOTH gate scales
      // without degenerating into max-round churn: sf0.01's ~250-doc
      // clusters exceed maxBucket=100, and the pair budget SCALES with
      // the corpus (pair counts grow ~n²: sf0.01 ≈ 31k pairs vs 20k
      // budget, sf0.1 ≈ 2.9M vs 2M) so star rounds provably FIRE at
      // every gate scale yet stop after a bounded number of rounds —
      // the chunk verifier then takes one genuinely large leftover
      // set, instead of the sweep paying ~16 rounds of per-round job
      // overhead to prove the same two branches
      val n = docs.count()
      val budget = math.max(20000L, (n * n) / 12500L * 1000L)
      Dedup.minhashDedupKeepers(docs, "doc_id", "toks", 0.8,
          maxBucket = 100, leftoverPairBudget = budget)
        .select(col("id").as("doc_id"), col("keeper_id"))
        .orderBy(col("doc_id"))
    }
    finally saved match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  private val dedupMinhashKeepersOracle =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id,
      |    list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS toks
      |  FROM documents
      |),
      |e AS (
      |  SELECT a.doc_id AS src, b.doc_id AS dst
      |  FROM t a JOIN t b ON a.doc_id <> b.doc_id
      |  WHERE len(list_intersect(a.toks, b.toks)) * 1.0
      |        / len(list_distinct(a.toks || b.toks)) >= 0.8
      |),
      |reach(id, rid) AS (
      |  SELECT doc_id, doc_id FROM t
      |  UNION
      |  SELECT r.id, e.dst FROM reach r JOIN e ON e.src = r.rid
      |)
      |SELECT id AS doc_id, min(rid) AS keeper_id FROM reach GROUP BY id
      |ORDER BY doc_id""".stripMargin

  /** SimHash near-dup pairs over a 62-bit sketch built from TWO
    * SQL-reproducible 31-bit polynomial token hashes (multipliers 31
    * and 37) — the whole pipeline (sketch, chunk blocking, hamming
    * verify) is then exactly replayable in DuckDB, upgrading this from
    * a rows-only check to a full hash-verified oracle. The xxhash64
    * sketch stays the library default (DedupSpec covers it); blocking
    * is pigeonhole-exact either way, so the oracle can compare against
    * plain exhaustive hamming. */
  private def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), tokenize(col("text")).as("toks"))
    Dedup.simhashNearDupPairs(docs, "doc_id", "toks", maxHamming = 3,
        tokenHash = t => polyhash31(t, 31) + shiftleft(polyhash31(t, 37), 31))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val polyToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** DuckDB replay of [[graft.functions.PolyHash31]] over a string
    * expression `e`. */
  private def polySql(e: String, mult: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, len($e)+1), j -> ascii(($e)[j]))),
       |  (a, b) -> (a * $mult + b) % 2147483647)""".stripMargin

  private val dedupSimhashOracle =
    s"""WITH t AS (SELECT doc_id, $polyToks AS toks FROM documents),
       |h AS (
       |  SELECT doc_id, list_transform(toks, tk ->
       |    ${polySql("tk", 31)} + (${polySql("tk", 37)} << 31)) AS hs
       |  FROM t
       |),
       |e AS (SELECT doc_id, u.h AS h FROM h, unnest(hs) AS u(h)),
       |bits AS (
       |  SELECT doc_id, r.b AS b,
       |    sum(CASE WHEN (h >> CAST(r.b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM e CROSS JOIN range(62) AS r(b) GROUP BY doc_id, r.b
       |),
       |sk0 AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS sh
       |  FROM bits GROUP BY doc_id
       |),
       |sk AS (SELECT t.doc_id, coalesce(sk0.sh, 0) AS sh
       |       FROM t LEFT JOIN sk0 ON t.doc_id = sk0.doc_id)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
       |FROM sk a JOIN sk b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sh, b.sh)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  /** 3-gram shingle jaccard between consecutive doc ids — linear-cost
    * n-gram similarity with an exact oracle. */
  private def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(
      col("doc_id"),
      org.apache.spark.sql.graftshim.GraftSqlShim.column(
        graft.functions.WordShingles(
          org.apache.spark.sql.graftshim.GraftSqlShim.expression(col("text")), 3))
        .as("sh"))
    val a = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = docs.select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"),
      col("sh").as("sh_b"))
    a.join(b, "id_a")
      .select(col("id_a"), col("id_b"),
        round(Dedup.jaccard(array_distinct(col("sh_a")), array_distinct(col("sh_b"))), 4)
          .as("jaccard"))
      .orderBy(col("id_a"))
  }

  private val ngramJaccardOracle =
    """WITH s AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(toks) - 1),
      |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
      |    ELSE [] END AS sh
      |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents)
      |)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(CASE WHEN len(list_distinct(a.sh || b.sh)) = 0 THEN 0.0
      |    ELSE len(list_intersect(a.sh, b.sh)) * 1.0 / len(list_distinct(a.sh || b.sh))
      |  END, 4) AS jaccard
      |FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
      |ORDER BY id_a""".stripMargin

  /** Embedding cosine near-dup, blocked on a 6-bit axis-aligned
    * sign-LSH bucket — the shape that survives 100 TB (all-pairs only
    * within a block; a skewed block splits across tasks via AQE
    * skew-join, no block is dropped). Axis-aligned planes keep the
    * bucket exactly SQL-expressible so the whole pipeline is
    * oracle-checked; the Gaussian-plane variant is covered in
    * DedupSpec. */
  private def embeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", Dedup.embeddingLshBucketAxis(col("embedding"), 6))
    Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", "bucket", 0.70)
      .select(col("id_a"), col("id_b"), round(col("dist"), 4).as("dist"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val embeddingNearDupOracle = {
    val dot =
      "list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    def norm(c: String) =
      s"sqrt(list_sum(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    (SELECT sum(CASE WHEN embedding[i+1] > 0 THEN 1<<i ELSE 0 END)
       |     FROM range(6) t(i)) AS bucket
       |  FROM embeddings
       |)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(1.0 - $dot / (${norm("a.embedding")} * ${norm("b.embedding")}), 4) AS dist
       |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE 1.0 - $dot / (${norm("a.embedding")} * ${norm("b.embedding")}) < 0.70
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Contrastive triplets: positives = the near-dup pairs above,
    * negatives = deterministic hash probes into the id space, filtered
    * to exist, differ from anchor/positive, and avoid the anchor's
    * near-dup neighborhood. Full SQL replay including the probe
    * formula and the anti-join. */
  private def contrastiveTriplets(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", Dedup.embeddingLshBucketAxis(col("embedding"), 6))
    graft.ops.ContrastiveMining
      .mineTriplets(e, "vec_id", "embedding", "bucket", 0.70)
      .select(col("id_a"), col("id_b"), col("neg_id"),
        round(col("dist"), 4).as("dist"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private lazy val contrastiveOracle = {
    val dot =
      "list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    def norm(c: String) =
      s"sqrt(list_sum(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    val probe = polySql("concat('neg:', CAST(id_a AS VARCHAR))", 31)
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    (SELECT sum(CASE WHEN embedding[i+1] > 0 THEN 1<<i ELSE 0 END)
       |     FROM range(6) t(i)) AS bucket
       |  FROM embeddings
       |), pr AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    1.0 - $dot / (${norm("a.embedding")} * ${norm("b.embedding")}) AS dist
       |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE 1.0 - $dot / (${norm("a.embedding")} * ${norm("b.embedding")}) < 0.70
       |), c AS (
       |  SELECT id_a, id_b, dist, u.k,
       |    ($probe + u.k * 2654435761) %
       |      (SELECT count(*) FROM embeddings) AS cand
       |  FROM pr, LATERAL (SELECT unnest(range(0, 10)) AS k) u
       |), v AS (
       |  SELECT c.* FROM c
       |  JOIN embeddings ee ON ee.vec_id = c.cand
       |  WHERE c.cand <> c.id_a AND c.cand <> c.id_b
       |    AND NOT EXISTS (SELECT 1 FROM pr p2
       |      WHERE (p2.id_a = c.id_a AND p2.id_b = c.cand)
       |         OR (p2.id_b = c.id_a AND p2.id_a = c.cand))
       |)
       |SELECT id_a, id_b, arg_min(cand, k) AS neg_id,
       |  round(min(dist), 4) AS dist
       |FROM v GROUP BY id_a, id_b ORDER BY id_a, id_b""".stripMargin
  }

  /** Dedup DECISIONS over embedding-space near-dups: connected
    * components of the cosine near-dup graph, keeper = component min
    * (the linear-output form, like [[dedupMinhashKeepers]] for text).
    */
  private def embeddingDedupKeepers(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", Dedup.embeddingLshBucketAxis(col("embedding"), 6))
    val pairs = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", "bucket", 0.70)
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
    e.select(col("vec_id").cast("long").as("vec_id"))
      .join(comp.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("label"), col("vec_id")).as("keeper_id"))
      .orderBy(col("vec_id"))
  }

  private val embeddingDedupKeepersOracle = {
    val dot =
      "list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    def norm(c: String) =
      s"sqrt(list_sum(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"""WITH RECURSIVE e AS (
       |  SELECT vec_id, embedding,
       |    (SELECT sum(CASE WHEN embedding[i+1] > 0 THEN 1<<i ELSE 0 END)
       |     FROM range(6) t(i)) AS bucket
       |  FROM embeddings
       |),
       |p AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst
       |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
       |  WHERE 1.0 - $dot / (${norm("a.embedding")} * ${norm("b.embedding")}) < 0.70
       |),
       |reach(id, rid) AS (
       |  SELECT vec_id, vec_id FROM e
       |  UNION
       |  SELECT r.id, p.dst FROM reach r JOIN p ON p.src = r.rid
       |)
       |SELECT id AS vec_id, min(rid) AS keeper_id FROM reach GROUP BY id
       |ORDER BY vec_id""".stripMargin
  }

  /** Exact substring dedup (Lee et al. ACL 2022 ExactSubstr): merged
    * removal spans of every 40-char window whose content occurs ≥2
    * times corpus-wide, keeping the first (doc_id, pos) site. The
    * oracle replays window marking, canonical row_number pick, and
    * gaps-and-islands span merge in SQL. At sf0.01 several docs are
    * FULLY covered by their span (178, 185, …), so the clean gate
    * also exercises the everything-removed edge.
    */
  private def dedupSubstringSpans(s: SparkSession, dir: String): DataFrame =
    graft.ops.SubstringDedup
      .duplicatedSpans(Tables.documents(s, dir), "doc_id", "text", 40)
      .orderBy(col("doc_id"), col("span_start"))

  private val dedupSubstringSpansOracle =
    """WITH pos AS (
      |  SELECT doc_id, g.pos AS pos, substr(text, g.pos, 40) AS gram
      |  FROM documents,
      |    LATERAL (SELECT unnest(generate_series(1,
      |      greatest(length(text) - 39, 0))) AS pos) g
      |),
      |marked AS (
      |  SELECT doc_id, pos,
      |    row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn,
      |    count(*) OVER (PARTITION BY gram) AS sites
      |  FROM pos
      |),
      |win AS (
      |  SELECT doc_id, pos AS s, pos + 39 AS e
      |  FROM marked WHERE sites > 1 AND rn > 1
      |),
      |isl AS (
      |  SELECT doc_id, s, e,
      |    CASE WHEN s > coalesce(max(e) OVER (
      |        PARTITION BY doc_id ORDER BY s, e
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
      |      THEN 1 ELSE 0 END AS brk
      |  FROM win
      |),
      |grp AS (
      |  SELECT doc_id, s, e,
      |    sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
      |                   ROWS UNBOUNDED PRECEDING) AS island
      |  FROM isl
      |)
      |SELECT doc_id, min(s) AS span_start, max(e) AS span_end
      |FROM grp GROUP BY doc_id, island
      |ORDER BY doc_id, span_start""".stripMargin

  /** Cleaned text after cutting the duplicated spans; docs without
    * dups pass through, fully-covered docs become empty strings. */
  private def dedupSubstringClean(s: SparkSession, dir: String): DataFrame =
    graft.ops.SubstringDedup
      .removeDuplicated(Tables.documents(s, dir), "doc_id", "text", 40)
      .orderBy(col("doc_id"))

  private val dedupSubstringCleanOracle = {
    val spans = dedupSubstringSpansOracle
      .replace("ORDER BY doc_id, span_start", "")
    s"""WITH sp AS ($spans),
      |seg AS (
      |  SELECT d.doc_id, d.text,
      |    coalesce(lag(sp.span_end) OVER (
      |      PARTITION BY d.doc_id ORDER BY sp.span_start), 0) + 1 AS ks,
      |    sp.span_start - 1 AS ke
      |  FROM documents d JOIN sp ON d.doc_id = sp.doc_id
      |),
      |tl AS (
      |  SELECT d.doc_id, d.text, max(sp.span_end) + 1 AS ks,
      |    length(d.text) AS ke
      |  FROM documents d JOIN sp ON d.doc_id = sp.doc_id
      |  GROUP BY d.doc_id, d.text
      |),
      |segs AS (SELECT * FROM seg UNION ALL SELECT * FROM tl),
      |built AS (
      |  SELECT doc_id,
      |    string_agg(substr(text, ks::int, (ke - ks + 1)::int),
      |               '' ORDER BY ks) AS text_clean
      |  FROM segs WHERE ke >= ks GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |  CASE WHEN d.doc_id IN (SELECT doc_id FROM sp)
      |       THEN coalesce(b.text_clean, '') ELSE d.text END AS text_clean
      |FROM documents d LEFT JOIN built b ON d.doc_id = b.doc_id
      |ORDER BY d.doc_id""".stripMargin
  }

  /** Corpus-level boilerplate line removal (CCNet/RefinedWeb-style):
    * lines occurring in more than `maxDocFreq` distinct docs drop from
    * every doc, order and blank lines preserved. The fixture docs are
    * single-line, so the gate builds a page-shaped corpus from them
    * deterministically — per-language nav header (hot), blank line
    * (never dropped), the doc body (unique), and a site footer on
    * every third doc (hot) — and the oracle replays the same
    * construction. Exact oracle.
    */
  private def dedupLines(s: SparkSession, dir: String): DataFrame = {
    val pages = Tables.documents(s, dir).select(
      col("doc_id"),
      concat_ws("\n",
        concat(lit("NAV "), col("lang")),
        lit(""),
        col("text"),
        when(col("doc_id") % 3 === 0, lit("FOOTER cookie banner"))
          .otherwise(concat(lit("tail "), col("doc_id")))).as("page"))
    Dedup.dropBoilerplateLines(pages, "doc_id", "page", maxDocFreq = 50)
      .select(col("id").as("doc_id"), col("text").as("cleaned"))
      .orderBy(col("doc_id"))
  }

  private val dedupLinesOracle =
    """WITH pages AS (
      |  SELECT doc_id,
      |    'NAV ' || lang || chr(10) || chr(10) || text || chr(10) ||
      |    CASE WHEN doc_id % 3 = 0 THEN 'FOOTER cookie banner'
      |         ELSE 'tail ' || doc_id END AS page
      |  FROM documents
      |),
      |pl AS (SELECT doc_id, string_split(page, chr(10)) AS lines FROM pages),
      |l AS (
      |  SELECT doc_id, u.i AS pos, lines[u.i] AS line
      |  FROM pl, unnest(range(1, len(lines) + 1)) AS u(i)
      |),
      |hot AS (
      |  SELECT line FROM (
      |    SELECT line, count(DISTINCT doc_id) AS df FROM l
      |    WHERE len(line) > 0 GROUP BY line
      |  ) WHERE df > 50
      |)
      |SELECT d.doc_id,
      |  coalesce((
      |    SELECT string_agg(k.line, chr(10) ORDER BY k.pos)
      |    FROM l k WHERE k.doc_id = d.doc_id
      |      AND k.line NOT IN (SELECT line FROM hot)
      |  ), '') AS cleaned
      |FROM pages d ORDER BY d.doc_id""".stripMargin

  // ----------------------------------------------------- text analysis

  private def langId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.languageId(col("text")).as("lang_guess"))
      .orderBy(col("doc_id"))

  private val langIdOracle = {
    val toks =
      "list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))"
    val scores = TextAnalysis.markers.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_intersect($toks, $list)) AS s_$lang"
    }.mkString(", ")
    // fold-left argmax with strict > (first wins ties), 0 → unknown
    s"""WITH scored AS (SELECT doc_id, $scores FROM documents)
       |SELECT doc_id,
       |  CASE
       |    WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'unknown'
       |    WHEN s_fr > s_es AND s_fr > s_de AND s_fr > s_en THEN 'fr'
       |    WHEN s_es > s_de AND s_es > s_en THEN 'es'
       |    WHEN s_de > s_en THEN 'de'
       |    ELSE 'en'
       |  END AS lang_guess
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  // NOTE: rounded via floor(x*1e4+0.5)/1e4 on BOTH sides — Spark's
  // round() HALF_UPs the decimal string while DuckDB rounds the binary
  // double, and they disagree on exact 4-decimal half-ties.
  private def qualityScore(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        (floor(TextAnalysis.qualityScore(col("text")) * 1e4 + 0.5) / 1e4)
          .as("quality"))
      .orderBy(col("doc_id"))

  /** End-to-end prep composition — quality filter → exact dedup →
    * token-window chunk — gated as ONE query so the driver checks the
    * stages COMPOSE, not just pass individually. Thresholds compare on
    * the same floor-1e4 rounding both engines replay. */
  private def prepPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).where(col("text").isNotNull)
    val q = docs.where(
      floor(graft.text.TextAnalysis.qualityScore(col("text")) * 1e4 + 0.5) / 1e4
        >= 0.49)
    val kept = q.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("text"))
    graft.ops.TextPrep.chunkByTokens(kept, "doc_id", "text", 64, 16)
      .orderBy("doc_id", "chunk_id")
  }

  private val prepPipelineOracle = {
    val stops = graft.text.PorterStemmer.defaultStopwords
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH tq AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents WHERE text IS NOT NULL
       |),
       |q AS (
       |  SELECT doc_id, text FROM tq
       |  WHERE floor((
       |    0.4 * (CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE len(list_filter(toks, x -> list_contains($stops, x))) * 1.0 / len(toks) END)
       |    + 0.3 * least(len(toks) / 20.0, 1.0)
       |    + 0.3 * least((CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks) END) / 8.0, 1.0)
       |  ) * 1e4 + 0.5) / 1e4 >= 0.49
       |),
       |kept AS (SELECT min(doc_id) AS doc_id, text FROM q GROUP BY text),
       |t AS (
       |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
       |  FROM kept
       |),
       |c AS (SELECT doc_id, CAST(len(tk) AS INT) AS n, tk FROM t WHERE len(tk) > 0),
       |e AS (
       |  SELECT doc_id, tk, n, CAST(r.i AS INT) AS chunk_id
       |  FROM c, unnest(range(0, CASE WHEN n <= 64 THEN 1
       |    ELSE 1 + CAST(ceil((n - 64) / 48.0) AS INT) END)) AS r(i)
       |)
       |SELECT doc_id, chunk_id,
       |  CAST(least(64, n - chunk_id * 48) AS INT) AS n_tokens,
       |  array_to_string(list_slice(tk, chunk_id * 48 + 1,
       |    least(chunk_id * 48 + 64, n)), ' ') AS chunk_text
       |FROM e ORDER BY doc_id, chunk_id""".stripMargin
  }

  private val qualityScoreOracle = {
    val stops = graft.text.PorterStemmer.defaultStopwords
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents
       |)
       |SELECT doc_id,
       |  floor((
       |    0.4 * (CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE len(list_filter(toks, x -> list_contains($stops, x))) * 1.0 / len(toks) END)
       |    + 0.3 * least(len(toks) / 20.0, 1.0)
       |    + 0.3 * least((CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks) END) / 8.0, 1.0)
       |  ) * 1e4 + 0.5) / 1e4 AS quality
       |FROM t ORDER BY doc_id""".stripMargin
  }

  /** Order-sensitive doc fingerprint, SQL-reproducible variant (the
    * xxhash64 default is covered by TextAnalysisSpec) — full exact
    * oracle instead of the previous rows-only check. */
  private def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.docFingerprintSql(col("text")).as("fp"))
      .orderBy(col("doc_id"))
      .limit(50)

  private val fingerprintOracle =
    s"""WITH t AS (SELECT doc_id, $polyToks AS toks FROM documents)
       |SELECT doc_id,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(toks, tk -> ${polySql("tk", 31)})),
       |    (a, b) -> (a * 31 + b) % 2147483647) AS fp
       |FROM t ORDER BY doc_id LIMIT 50""".stripMargin

  /** Non-null (doc_id, text) rows plus their 4-way doc_id-range chunk
    * files — the shared FILE-source feed of the document streaming
    * gates (no driver materialization of the stream input; only the
    * min/max(doc_id) aggregate reaches the driver). */
  private def docChunks(s: SparkSession, dir: String)
      : (DataFrame, Seq[java.io.File], Long) = {
    import s.implicits._
    val base = Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val (minId, maxId) = base.agg(min("doc_id"), max("doc_id"))
      .as[(Long, Long)].head()
    val width = (maxId - minId) / 4 + 1
    val chunkRoot = AnnQueries.artifactDir("sdocs", dir, "documents")
    val files = StreamChunks.materialize(chunkRoot,
      (0 until 4).map { c => () =>
        base.where(col("doc_id") >= minId + c * width &&
          col("doc_id") < minId + (c + 1) * width)
      })
    (base, files, maxId)
  }

  /** Streaming dedup gate: the documents table fed through the FILE
    * source as 4 doc_id-range parquet chunk files (`readStream` +
    * `maxFilesPerTrigger 1` — no driver materialization of the stream
    * input); the stateful stream must emit EXACTLY one keeper per
    * distinct fingerprint across all chunks (state must dedup across
    * micro-batches, not just within one). Output is group-level
    * (fp, n_kept) — which member of a duplicate group wins within a
    * micro-batch is shuffle-order dependent, but the fingerprint
    * PARTITION is deterministic and the oracle recomputes it in SQL.
    * Null texts are excluded (a null fingerprint has no long key). */
  private def streamingDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val (base, files, _) = docChunks(s, dir)
    val (streamDir, src) = StreamChunks.source(s, base.schema)
    val deduped = graft.streaming.StreamingDedup.dropSeenDuplicates(
      src, "text", TextAnalysis.docFingerprintSql)
    // fresh sink table per invocation — Bench reps re-run the query in
    // one session and a shared name would accumulate rows
    val sink = "graft_sdedup_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    withShufflePartitions(s, 8) {
      val q = deduped.writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      StreamChunks.drive(q, streamDir, files)
    }
    s.table(sink)
      .select(TextAnalysis.docFingerprintSql(col("text")).as("fp"))
      .groupBy("fp").agg(count(lit(1)).cast("int").as("n_kept"))
      .orderBy("fp")
  }

  /** The BUILT-IN bounded-state variant: duplicates ride a synthetic
    * event time and a watermark delay longer than the corpus span, so
    * `dropDuplicatesWithinWatermark` must keep exactly one doc per
    * fingerprint — hash-matching the same oracle as the
    * unbounded-state `streaming_dedup`. The operator under test is
    * Spark's own; the gate pins OUR fingerprint plumbing + the
    * expiry-window contract. */
  private def streamingDedupTtl(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val (base, files, _) = docChunks(s, dir)
    val (streamDir, rawSrc) = StreamChunks.source(s, base.schema)
    val src = rawSrc
      .withColumn("ts", timestamp_seconds(col("doc_id") + sqBase))
    val deduped = graft.streaming.StreamingDedup.dropDuplicatesWithinDelay(
      src, "text", "ts", "3 hours", TextAnalysis.docFingerprintSql)
    val sink = "graft_sttl_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    withShufflePartitions(s, 8) {
      val q = deduped.writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      StreamChunks.drive(q, streamDir, files)
    }
    s.table(sink)
      .select(TextAnalysis.docFingerprintSql(col("text")).as("fp"))
      .groupBy("fp").agg(count(lit(1)).cast("int").as("n_kept"))
      .orderBy("fp")
  }

  private val streamingDedupOracle =
    s"""WITH t AS (SELECT doc_id, $polyToks AS toks FROM documents
       |          WHERE text IS NOT NULL),
       |f AS (SELECT doc_id,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(toks, tk -> ${polySql("tk", 31)})),
       |    (a, b) -> (a * 31 + b) % 2147483647) AS fp
       |  FROM t)
       |SELECT fp, CAST(1 AS INT) AS n_kept FROM f GROUP BY fp ORDER BY fp""".stripMargin

  /** Watermarked windowed-quality monitoring gate: documents ride a
    * synthetic event time (`base + doc_id` seconds, so windows are
    * pure integer arithmetic the oracle replays), fed through the
    * FILE source in 4 chunk files with APPEND output — windows only emit
    * once the watermark passes them, which two far-future flush rows
    * force for the tail (their own windows sit past the cutoff and
    * are filtered). The per-window mean is computed over 1e-4
    * quantized scores, so distributed reduction order cannot perturb
    * it — that is what makes this hash-comparable at all. */
  private val sqBase = 1700000000L

  private def streamingQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val (base, docFiles, maxId) = docChunks(s, dir)
    // watermark only finalizes a window in a LATER batch: two flush
    // files a day past the stream push every real window out (their
    // own windows sit past the cutoff and are filtered)
    val flushRoot = AnnQueries.artifactDir("squalflush", dir, "documents")
    val flushFiles = StreamChunks.materialize(flushRoot, Seq(
      () => Seq((maxId + 86400L, "flush")).toDF("doc_id", "text"),
      () => Seq((maxId + 86400L + 600L, "flush")).toDF("doc_id", "text")))
    val (streamDir, rawSrc) = StreamChunks.source(s, base.schema)
    val src = rawSrc
      .withColumn("ts", timestamp_seconds(col("doc_id") + sqBase))
    val agg = graft.streaming.StreamingDedup.qualityByWindow(
      src, "ts", "text", "1 minute", "2 minutes")
    val sink = "graft_squal_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // state partitions pinned low: gate state is ~100 windows, and the
    // per-batch state-store commit cost scales with partitions × batches
    withShufflePartitions(s, 8) {
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      StreamChunks.drive(q, streamDir, docFiles ++ flushFiles)
    }
    val cutoff = (sqBase + maxId) / 60L * 60L
    s.table(sink)
      .select(unix_timestamp(col("window_start")).as("window_start"),
        col("n_docs"), col("avg_quality"))
      .where(col("window_start") <= cutoff)
      .orderBy(col("window_start"))
  }

  private val streamingQualityOracle = {
    val stops = graft.text.PorterStemmer.defaultStopwords
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, $polyToks AS toks
       |  FROM documents WHERE text IS NOT NULL),
       |q AS (
       |  SELECT doc_id, CAST(floor((
       |    0.4 * (CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE len(list_filter(toks, x -> list_contains($stops, x))) * 1.0 / len(toks) END)
       |    + 0.3 * least(len(toks) / 20.0, 1.0)
       |    + 0.3 * least((CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks) END) / 8.0, 1.0)
       |  ) * 1e4 + 0.5) AS BIGINT) AS q4
       |  FROM t),
       |w AS (SELECT (($sqBase + doc_id) // 60) * 60 AS ws, q4 FROM q)
       |SELECT ws AS window_start, count(*) AS n_docs,
       |  round(CAST(sum(q4) AS DOUBLE) / count(*) / 1e4, 4) AS avg_quality
       |FROM w GROUP BY ws ORDER BY ws""".stripMargin
  }

  /** Deflate-ratio quality signal gate (the Dolma/RefinedWeb gzip
    * filter). No SQL engine replays DEFLATE, so the gate is
    * SELF-VERIFYING on the signal's defining invariants over the whole
    * documents table (recall-gate pattern):
    *  1. bounds — every non-empty doc's ratio is finite in (0, 1.5];
    *  2. repetition sensitivity — doubling a doc (`text ‖ text`) must
    *     compress proportionally BETTER for every doc ≥ 100 chars
    *     (the back-reference covers the second copy);
    *  3. extremes — a pure repeat compresses under 0.1 while a
    *     high-entropy hex string stays above 0.5 (both derived
    *     in-plan, no literals shipped from the driver). */
  private def compressionRatioGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r = TextAnalysis.compressionRatio(col("text"))
    val docs = Tables.documents(s, dir)
      .where(col("text").isNotNull && length(col("text")) > 0)
    val stats = docs.select(
        r.as("r"),
        TextAnalysis.compressionRatio(concat(col("text"), col("text"))).as("r2"),
        length(col("text")).as("len"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("r") > 0 && col("r") <= 1.5 && !isnan(col("r")), 1)
          .otherwise(0)).as("bounded"),
        sum(when(col("len") >= 100 &&
            col("r2") >= col("r") * 0.75 + 0.05, 1).otherwise(0)).as("bad2"),
        sum(when(col("len") >= 100, 1).otherwise(0)).as("n100"))
      .head()
    val extremes = docs.limit(1).select(
        TextAnalysis.compressionRatio(
          concat_ws("", array_repeat(lit("the quick brown fox "), 100))).as("rep"),
        TextAnalysis.compressionRatio(
          concat_ws("", (0 until 40).map(i =>
            sha2(concat(col("text"), lit(i.toString)), 256)): _*)).as("rnd"))
      .head()
    val ok = stats.getLong(0) > 0 &&
      stats.getLong(1) == stats.getLong(0) &&
      stats.getLong(2) == 0 && stats.getLong(3) > 0 &&
      extremes.getDouble(0) < 0.1 && extremes.getDouble(1) > 0.5
    if (ok) Seq(1).toDF("ok") else Seq.empty[Int].toDF("ok")
  }

  /** Winnowing fingerprints (SIGMOD'03), polynomial-gram-hash variant
    * so the full k-gram → window-min → distinct pipeline is replayed by
    * the oracle; emitted space-joined (array columns are unhashable
    * driver-side). The xxhash64 default is covered in TextAnalysisSpec.
    */
  private def winnow(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        TextAnalysis.winnowFingerprintsSql(col("text")).as("fps"))
      .select(col("doc_id"),
        concat_ws(" ", transform(col("fps"), x => x.cast("string"))).as("fps"))
      .orderBy(col("doc_id"))
      .limit(50)

  private val winnowOracle =
    s"""WITH t AS (SELECT doc_id, $polyToks AS toks FROM documents),
       |g AS (
       |  SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
       |    list_transform(
       |      list_transform(range(1, len(toks) - 1),
       |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])),
       |      sh -> ${polySql("sh", 31)})
       |  ELSE [] END AS grams
       |  FROM t
       |),
       |m AS (
       |  SELECT doc_id, CASE
       |    WHEN len(grams) >= 4 THEN
       |      list_transform(range(1, len(grams) - 2),
       |        i -> least(grams[i], grams[i+1], grams[i+2], grams[i+3]))
       |    WHEN len(grams) > 0 THEN [list_min(grams)]
       |    ELSE [] END AS mins
       |  FROM g
       |)
       |SELECT doc_id,
       |  array_to_string(list_sort(list_distinct(mins)), ' ') AS fps
       |FROM m ORDER BY doc_id LIMIT 50""".stripMargin

  /** Gopher-style repetition signals per doc (floor-rounded like
    * quality_score so Spark and DuckDB round identically). */
  private def repetitionQuality(s: SparkSession, dir: String): DataFrame = {
    def r4(c: org.apache.spark.sql.Column) = floor(c * 1e4 + 0.5) / 1e4
    Tables.documents(s, dir)
      .select(col("doc_id"),
        TextAnalysis.repetitionStats(col("text"), topN = 2, dupN = 3).as("r"))
      .select(col("doc_id"),
        r4(col("r.top_ngram")).as("top_2gram"),
        r4(col("r.dup_ngram")).as("dup_3gram"),
        r4(col("r.max_token")).as("max_token"),
        r4(col("r.dup_line")).as("dup_line"))
      .orderBy(col("doc_id"))
  }

  private val repetitionQualityOracle = {
    def mode(arr: String) =
      s"list_max(list_transform(list_distinct($arr), g -> len(list_filter($arr, x -> x = g))))"
    s"""WITH t AS (SELECT doc_id, $polyToks AS toks, text FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
       |      i -> concat_ws(' ', toks[i], toks[i+1])) ELSE [] END AS g2,
       |    CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
       |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) ELSE [] END AS g3,
       |    toks,
       |    list_filter(string_split(text, chr(10)), l -> len(l) > 0) AS lines
       |  FROM t
       |)
       |SELECT doc_id,
       |  floor((CASE WHEN len(g2) = 0 THEN 0.0
       |    ELSE ${mode("g2")} * 1.0 / len(g2) END) * 1e4 + 0.5) / 1e4 AS top_2gram,
       |  floor((CASE WHEN len(g3) = 0 THEN 0.0
       |    ELSE (len(g3) - len(list_distinct(g3))) * 1.0 / len(g3) END) * 1e4 + 0.5) / 1e4 AS dup_3gram,
       |  floor((CASE WHEN len(toks) = 0 THEN 0.0
       |    ELSE ${mode("toks")} * 1.0 / len(toks) END) * 1e4 + 0.5) / 1e4 AS max_token,
       |  floor((CASE WHEN len(lines) = 0 THEN 0.0
       |    ELSE (len(lines) - len(list_distinct(lines))) * 1.0 / len(lines) END) * 1e4 + 0.5) / 1e4 AS dup_line
       |FROM g ORDER BY doc_id""".stripMargin
  }

  private def punctRatio(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        (floor(TextAnalysis.punctRatio(col("text")) * 1e4 + 0.5) / 1e4)
          .as("punct_ratio"))
      .orderBy(col("doc_id"))

  private val punctRatioOracle =
    """SELECT doc_id,
      |  floor((CASE WHEN len(text) = 0 THEN 0.0
      |    ELSE len(regexp_replace(text, '[\w\s]', '', 'g')) * 1.0 / len(text)
      |  END) * 1e4 + 0.5) / 1e4 AS punct_ratio
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Benchmark decontamination over the documents table: docs with
    * `doc_id % 97 == 0` stand in as the held-out eval set, every other
    * doc is counted for distinct shared 3-grams against the broadcast
    * benchmark shingle set (3-grams, not the production-default 13,
    * because the synthetic corpus' docs are ~100 tokens of a ~40-word
    * vocabulary — real pipelines use 8–13). Zero-shuffle map-side
    * plan; oracle replays shingling + overlap in SQL. */
  private def decontaminate(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Decontaminate
    val docs = Tables.documents(s, dir)
    val bench = docs.where(col("doc_id") % 97 === 0)
    val set = Decontaminate.benchmarkShingles(bench, "text", 3)
    docs.where(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"),
        // coalesce like Decontaminate.flag: a NULL-text row must read
        // clean (0), matching the oracle's coalesce(c.c, 0)
        coalesce(Decontaminate.contaminationCount(col("text"), set, 3), lit(0))
          .as("n_contaminated"))
      .withColumn("flagged", col("n_contaminated") >= 2)
      .orderBy(col("doc_id"))
  }

  private val decontaminateOracle =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
      |    list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
      |    ELSE [] END AS sh FROM t
      |), ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
      |bench AS (SELECT DISTINCT g FROM ex WHERE doc_id % 97 = 0),
      |c AS (
      |  SELECT e.doc_id, count(*) FILTER (WHERE b.g IS NOT NULL) AS c
      |  FROM ex e LEFT JOIN bench b USING(g)
      |  WHERE e.doc_id % 97 <> 0 GROUP BY e.doc_id
      |)
      |SELECT t.doc_id, CAST(coalesce(c.c, 0) AS INT) AS n_contaminated,
      |  coalesce(c.c, 0) >= 2 AS flagged
      |FROM t LEFT JOIN c ON t.doc_id = c.doc_id
      |WHERE t.doc_id % 97 <> 0 ORDER BY t.doc_id""".stripMargin

  /** Embedding-space decontamination: the semantic complement of the
    * n-gram `decontaminate` gate — vectors with `vec_id % 97 == 0`
    * stand in as the eval set, every other vector gets its max cosine
    * similarity to ANY eval vector via one broadcast + codegen'd
    * map-side pass (no join, no shuffle in the corpus scan). τ = 0.3
    * flags the tail of this synthetic distribution (p90 ≈ 0.27);
    * production paraphrase-leak thresholds sit near 0.9 on real
    * encoder geometry. */
  private def decontaminateEmbedding(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Decontaminate
    val e = Tables.embeddings(s, dir)
    val bench = Decontaminate.benchmarkEmbeddings(
      e.where(col("vec_id") % 97 === 0), "embedding")
    e.where(col("vec_id") % 97 =!= 0)
      .select(col("vec_id"),
        (floor(Decontaminate.maxBenchSimilarity(col("embedding"), bench)
          * 1e4 + 0.5) / 1e4).as("max_sim"))
      .withColumn("flagged", col("max_sim") >= 0.3)
      .orderBy(col("vec_id"))
  }

  private val decontaminateEmbeddingOracle =
    """WITH b AS (
      |  SELECT embedding FROM embeddings WHERE vec_id % 97 = 0
      |), p AS (
      |  SELECT c.vec_id,
      |    max(list_sum(list_transform(list_zip(c.embedding, b.embedding),
      |          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(c.embedding,
      |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(b.embedding,
      |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) AS ms
      |  FROM embeddings c, b WHERE c.vec_id % 97 <> 0 GROUP BY c.vec_id
      |)
      |SELECT vec_id, floor(ms * 1e4 + 0.5) / 1e4 AS max_sim,
      |  floor(ms * 1e4 + 0.5) / 1e4 >= 0.3 AS flagged
      |FROM p ORDER BY vec_id""".stripMargin

  /** Gopher composite keep/reject gate with reject reasons —
    * minWords tuned to 30 for the ~10–100-token synthetic docs
    * (production default 50 would reject a third of the corpus for
    * length alone and mask the other rules). */
  private def gopherFilter(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        TextAnalysis.gopherFilter(col("text"), minWords = 30).as("g"))
      .select(col("doc_id"), col("g.n_words").as("n_words"),
        col("g.keep").as("keep"), col("g.reason").as("reason"))
      .orderBy(col("doc_id"))

  private val gopherFilterOracle = {
    val stops = "['the','and','of','to','a','in','is','it']"
    def mode(arr: String) =
      s"list_max(list_transform(list_distinct($arr), g -> len(list_filter($arr, x -> x = g))))"
    s"""WITH t AS (SELECT doc_id, text, $polyToks AS toks FROM documents),
       |s AS (
       |  SELECT doc_id, len(toks) AS nw,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks) END AS mwl,
       |    len(list_filter(toks, x -> list_contains($stops, x))) AS nstop,
       |    CASE WHEN len(toks) = 0 THEN 1.0
       |      ELSE len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) * 1.0 / len(toks) END AS alpha,
       |    CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
       |      i -> concat_ws(' ', toks[i], toks[i+1])) ELSE [] END AS g2,
       |    toks,
       |    list_filter(string_split(text, chr(10)), l -> len(l) > 0) AS lines
       |  FROM t
       |), r AS (
       |  SELECT doc_id, nw, mwl, nstop, alpha,
       |    CASE WHEN len(lines) = 0 THEN 0.0
       |      ELSE (len(lines) - len(list_distinct(lines))) * 1.0 / len(lines) END AS dup_line,
       |    CASE WHEN len(g2) = 0 THEN 0.0
       |      ELSE ${mode("g2")} * 1.0 / len(g2) END AS top2,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE ${mode("toks")} * 1.0 / len(toks) END AS maxtok
       |  FROM s
       |), v AS (
       |  SELECT doc_id, nw,
       |    CASE WHEN nw < 30 THEN 'too_few_words'
       |      WHEN nw > 100000 THEN 'too_many_words'
       |      WHEN mwl < 3.0 OR mwl > 10.0 THEN 'mean_word_length'
       |      WHEN nstop < 2 THEN 'too_few_stopwords'
       |      WHEN alpha < 0.8 THEN 'non_alpha_words'
       |      WHEN dup_line > 0.3 THEN 'repeated_lines'
       |      WHEN top2 > 0.2 THEN 'top_2gram'
       |      WHEN maxtok > 0.2 THEN 'max_token'
       |      ELSE 'ok' END AS reason
       |  FROM r
       |)
       |SELECT doc_id, CAST(nw AS INT) AS n_words, reason = 'ok' AS keep, reason
       |FROM v ORDER BY doc_id""".stripMargin
  }

  /** One-row corpus data card — release-notes numbers from one pass
    * family; every figure replayed in SQL. */
  private def dataCard(s: SparkSession, dir: String): DataFrame =
    graft.text.CorpusStats.dataCard(
      Tables.documents(s, dir), "doc_id", "text", "lang")

  private lazy val dataCardOracle = {
    val stops = graft.text.PorterStemmer.defaultStopwords
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val pii = graft.text.TextAnalysis.Pii.all
      .map { case (_, pat, _) =>
        s"regexp_matches(text, '${pat.replace("'", "''")}')"
      }
      .mkString(" OR ")
    s"""WITH base AS (
       |  SELECT count(*) AS n_docs,
       |    CAST(count(DISTINCT lang) AS INT) AS n_langs,
       |    CAST(sum(len(text)) AS BIGINT) AS total_chars
       |  FROM documents
       |), d AS (
       |  SELECT CAST(sum(c) - count(*) AS BIGINT) AS n_exact_dups
       |  FROM (SELECT count(*) AS c FROM documents
       |        WHERE text IS NOT NULL GROUP BY text)
       |), qt AS (
       |  SELECT $polyToks AS toks FROM documents WHERE text IS NOT NULL
       |), q AS (
       |  SELECT round(sum(q4) * 1.0 / count(*) / 1e4, 4) AS avg_quality
       |  FROM (SELECT CAST(floor((
       |      0.4 * (CASE WHEN len(toks) = 0 THEN 0.0
       |        ELSE len(list_filter(toks, x -> list_contains($stops, x))) * 1.0 / len(toks) END)
       |      + 0.3 * least(len(toks) / 20.0, 1.0)
       |      + 0.3 * least((CASE WHEN len(toks) = 0 THEN 0.0
       |        ELSE list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks) END) / 8.0, 1.0)
       |    ) * 1e4 + 0.5) AS BIGINT) AS q4 FROM qt)
       |), p AS (
       |  SELECT CAST(sum(CASE WHEN $pii THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_docs_with_pii
       |  FROM documents WHERE text IS NOT NULL
       |)
       |SELECT * FROM base, d, q, p""".stripMargin
  }

  /** Per-source corpus profile — the provenance breakdown a mixed
    * crawl ships with (docs, mean quality, Gopher keep-rate per
    * source). One partial-aggregated groupBy; quality quantized before
    * summation (order-proof means). */
  private def sourceProfile(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("source"),
        floor(TextAnalysis.qualityScore(col("text")) * 1e4 + 0.5)
          .cast("long").as("q4"),
        TextAnalysis.gopherFilter(col("text"), minWords = 30)
          .getField("keep").cast("int").as("kept"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).cast("int").as("n_docs"),
        round(sum(col("q4")).cast("double") / count(lit(1)) / 1e4, 4)
          .as("avg_quality"),
        round(sum(col("kept")).cast("double") / count(lit(1)), 4)
          .as("keep_rate"))
      .orderBy(col("source"))

  private lazy val sourceProfileOracle = {
    val stops = graft.text.PorterStemmer.defaultStopwords
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val gstops = "['the','and','of','to','a','in','is','it']"
    def mode(arr: String) =
      s"list_max(list_transform(list_distinct($arr), g -> len(list_filter($arr, x -> x = g))))"
    s"""WITH t AS (
       |  SELECT source, text, $polyToks AS toks FROM documents
       |  WHERE text IS NOT NULL
       |), sgl AS (
       |  SELECT source,
       |    CAST(floor((
       |      0.4 * (CASE WHEN len(toks) = 0 THEN 0.0
       |        ELSE len(list_filter(toks, x -> list_contains($stops, x))) * 1.0 / len(toks) END)
       |      + 0.3 * least(len(toks) / 20.0, 1.0)
       |      + 0.3 * least((CASE WHEN len(toks) = 0 THEN 0.0
       |        ELSE list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks) END) / 8.0, 1.0)
       |    ) * 1e4 + 0.5) AS BIGINT) AS q4,
       |    CASE WHEN len(toks) >= 30 AND len(toks) <= 100000
       |      AND (CASE WHEN len(toks) = 0 THEN 0.0
       |        ELSE list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks) END)
       |        BETWEEN 3.0 AND 10.0
       |      AND len(list_filter(toks, x -> list_contains($gstops, x))) >= 2
       |      AND (CASE WHEN len(toks) = 0 THEN 1.0
       |        ELSE len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) * 1.0 / len(toks) END) >= 0.8
       |      AND (CASE WHEN len(list_filter(string_split(text, chr(10)), l -> len(l) > 0)) = 0 THEN 0.0
       |        ELSE (len(list_filter(string_split(text, chr(10)), l -> len(l) > 0))
       |          - len(list_distinct(list_filter(string_split(text, chr(10)), l -> len(l) > 0)))) * 1.0
       |          / len(list_filter(string_split(text, chr(10)), l -> len(l) > 0)) END) <= 0.3
       |      AND (CASE WHEN len(toks) < 2 THEN 0.0
       |        ELSE ${mode(
      "list_transform(range(1, len(toks)), i -> concat_ws(' ', toks[i], toks[i+1]))")} * 1.0 / (len(toks) - 1) END) <= 0.2
       |      AND (CASE WHEN len(toks) = 0 THEN 0.0
       |        ELSE ${mode("toks")} * 1.0 / len(toks) END) <= 0.2
       |    THEN 1 ELSE 0 END AS kept
       |  FROM t
       |)
       |SELECT source, CAST(count(*) AS INT) AS n_docs,
       |  round(sum(q4) * 1.0 / count(*) / 1e4, 4) AS avg_quality,
       |  round(sum(kept) * 1.0 / count(*), 4) AS keep_rate
       |FROM sgl GROUP BY source ORDER BY source""".stripMargin
  }

  /** The capstone composition — the whole training-data prep flow a
    * reference user would run, as ONE gated query:
    * quality gate (full Gopher chain) → benchmark decontamination
    * (broadcast shingle set; eval docs excluded) → exact dedup
    * (min-id keeper) → deterministic train split → token-window
    * chunking. Every stage is the LIBRARY operator (not a re-spelled
    * query) and the oracle replays the entire five-stage chain in SQL.
    */
  private def fullPipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.{Decontaminate, Mixture, TextPrep}
    val docs = Tables.documents(s, dir).where(col("text").isNotNull)
    val g = docs.select(col("doc_id"), col("text"))
      .where(TextAnalysis.gopherFilter(col("text"), minWords = 30)
        .getField("keep"))
    val set = Decontaminate.benchmarkShingles(
      docs.where(col("doc_id") % 97 === 0), "text", 3)
    val clean = g.where(col("doc_id") % 97 =!= 0)
      .where(coalesce(
        Decontaminate.contaminationCount(col("text"), set, 3), lit(0)) < 2)
    val kept = clean.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id", "text")
    val train = kept.where(
      Mixture.assignSplits(col("doc_id"), "split42",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)) === "train")
    TextPrep.chunkByTokens(train, "doc_id", "text", 64, 16)
      .orderBy("doc_id", "chunk_id")
  }

  private lazy val fullPipelineOracle = {
    val stops = "['the','and','of','to','a','in','is','it']"
    def mode(arr: String) =
      s"list_max(list_transform(list_distinct($arr), g -> len(list_filter($arr, x -> x = g))))"
    val cum = Seq(0.9, 0.95).map(graft.ops.Mixture.threshold)
    val h =
      s"(${polySql("'split42:' || CAST(doc_id AS VARCHAR)", 31)} * " +
        s"${graft.ops.Mixture.MixStride} + " +
        s"${polySql("'split42:' || CAST(doc_id AS VARCHAR)", 37)}) % " +
        s"${graft.ops.Mixture.Mod}"
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
       |), tkn AS (
       |  SELECT doc_id, text, $polyToks AS toks FROM base
       |), gsig AS (
       |  SELECT doc_id, text, len(toks) AS nw,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks) END AS mwl,
       |    len(list_filter(toks, x -> list_contains($stops, x))) AS nstop,
       |    CASE WHEN len(toks) = 0 THEN 1.0
       |      ELSE len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) * 1.0 / len(toks) END AS alpha,
       |    CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
       |      i -> concat_ws(' ', toks[i], toks[i+1])) ELSE [] END AS g2,
       |    toks,
       |    list_filter(string_split(text, chr(10)), l -> len(l) > 0) AS lines
       |  FROM tkn
       |), gkeep AS (
       |  SELECT doc_id, text FROM gsig
       |  WHERE nw >= 30 AND nw <= 100000
       |    AND mwl >= 3.0 AND mwl <= 10.0
       |    AND nstop >= 2 AND alpha >= 0.8
       |    AND (CASE WHEN len(lines) = 0 THEN 0.0
       |      ELSE (len(lines) - len(list_distinct(lines))) * 1.0 / len(lines) END) <= 0.3
       |    AND (CASE WHEN len(g2) = 0 THEN 0.0
       |      ELSE ${mode("g2")} * 1.0 / len(g2) END) <= 0.2
       |    AND (CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE ${mode("toks")} * 1.0 / len(toks) END) <= 0.2
       |), sh AS (
       |  SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
       |    list_distinct(list_transform(range(1, len(toks) - 1),
       |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
       |    ELSE [] END AS grams FROM tkn
       |), ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
       |bench AS (SELECT DISTINCT g FROM ex WHERE doc_id % 97 = 0),
       |cc AS (
       |  SELECT e.doc_id, count(*) FILTER (WHERE b.g IS NOT NULL) AS c
       |  FROM ex e LEFT JOIN bench b USING (g)
       |  WHERE e.doc_id % 97 <> 0 GROUP BY e.doc_id
       |), clean AS (
       |  SELECT k.doc_id, k.text FROM gkeep k LEFT JOIN cc USING (doc_id)
       |  WHERE k.doc_id % 97 <> 0 AND coalesce(cc.c, 0) < 2
       |), kept AS (
       |  SELECT min(doc_id) AS doc_id, text FROM clean GROUP BY text
       |), train AS (
       |  SELECT doc_id, text FROM kept WHERE $h < ${cum.head}
       |), t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
       |  FROM train
       |), c AS (SELECT doc_id, CAST(len(tk) AS INT) AS n, tk FROM t WHERE len(tk) > 0),
       |e AS (
       |  SELECT doc_id, tk, n, CAST(r.i AS INT) AS chunk_id
       |  FROM c, unnest(range(0, CASE WHEN n <= 64 THEN 1
       |    ELSE 1 + CAST(ceil((n - 64) / 48.0) AS INT) END)) AS r(i)
       |)
       |SELECT doc_id, chunk_id,
       |  CAST(least(64, n - chunk_id * 48) AS INT) AS n_tokens,
       |  array_to_string(list_slice(tk, chunk_id * 48 + 1,
       |    least(chunk_id * 48 + 64, n)), ' ') AS chunk_text
       |FROM e ORDER BY doc_id, chunk_id""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("data_card", Some(dataCardOracle), dataCard),
    QueryDef("full_pipeline", Some(fullPipelineOracle), fullPipeline),
    QueryDef("source_profile", Some(sourceProfileOracle), sourceProfile),
    QueryDef(
      "dedup_exact",
      Some(
        """SELECT min(doc_id) AS keeper_id, count(*) AS n_dups
          |FROM documents GROUP BY text ORDER BY keeper_id""".stripMargin),
      dedupExact),
    QueryDef("dedup_minhash", Some(dedupMinhashOracle), dedupMinhash),
    QueryDef("dedup_minhash_keepers", Some(dedupMinhashKeepersOracle), dedupMinhashKeepers),
    QueryDef("dedup_minhash_keepers_scale",
      Some(dedupMinhashKeepersOracle), dedupMinhashKeepersScale),
    QueryDef("dedup_cross", Some(dedupCrossOracle), dedupCross),
    QueryDef("dedup_cross_keep", Some(dedupCrossKeepOracle), dedupCrossKeep),
    QueryDef("dedup_simhash", Some(dedupSimhashOracle), dedupSimhash),
    QueryDef("dedup_lines", Some(dedupLinesOracle), dedupLines),
    QueryDef("dedup_substring_spans",
      Some(dedupSubstringSpansOracle), dedupSubstringSpans),
    QueryDef("dedup_substring_clean",
      Some(dedupSubstringCleanOracle), dedupSubstringClean),
    QueryDef("decontaminate", Some(decontaminateOracle), decontaminate),
    QueryDef("decontaminate_embedding",
      Some(decontaminateEmbeddingOracle), decontaminateEmbedding),
    QueryDef("ngram_jaccard", Some(ngramJaccardOracle), ngramJaccard),
    QueryDef("embedding_near_dup", Some(embeddingNearDupOracle), embeddingNearDup),
    QueryDef("contrastive_triplets", Some(contrastiveOracle), contrastiveTriplets),
    QueryDef("embedding_dedup_keepers",
      Some(embeddingDedupKeepersOracle), embeddingDedupKeepers),
    QueryDef("lang_id", Some(langIdOracle), langId),
    QueryDef("quality_score", Some(qualityScoreOracle), qualityScore),
    QueryDef("gopher_filter", Some(gopherFilterOracle), gopherFilter),
    QueryDef("prep_pipeline", Some(prepPipelineOracle), prepPipeline),
    QueryDef("doc_fingerprint", Some(fingerprintOracle), fingerprint),
    QueryDef("streaming_dedup", Some(streamingDedupOracle), streamingDedup),
    QueryDef("streaming_dedup_ttl", Some(streamingDedupOracle), streamingDedupTtl),
    QueryDef("streaming_quality", Some(streamingQualityOracle), streamingQuality),
    QueryDef("winnow_fingerprint", Some(winnowOracle), winnow),
    QueryDef("punct_ratio", Some(punctRatioOracle), punctRatio),
    QueryDef("repetition_quality", Some(repetitionQualityOracle), repetitionQuality),
    QueryDef("compression_ratio", Some("SELECT 1 AS ok"), compressionRatioGate),
  )
}
