package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.tokenize
import graft.ops.{KnnClassify, Mixture, Packing}
import graft.text.CorpusStats

/** Driver-checkable queries for the training-data EXPORT stage:
  * mixture sampling, concat-and-chunk block packing, deterministic
  * shuffle-sharding, kNN seed-label classification, and vocabulary
  * coverage. Everything is a pure function of (seed, row id) or an
  * exact global prefix, so each gate has an exact DuckDB replay.
  */
object ExportQueries {

  /** DuckDB replay of [[graft.functions.PolyHash31]] over a string
    * expression `e` (same fold as PipelineQueries.polySql). */
  private def polySql(e: String, mult: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, len($e)+1), j -> ascii(($e)[j]))),
       |  (a, b) -> (a * $mult + b) % 2147483647)""".stripMargin

  /** DuckDB replay of [[Mixture.sampleHash]] — the two-fold remix. */
  private def mixHashSql(e: String): String =
    s"(${polySql(e, 31)} * ${Mixture.MixStride} + ${polySql(e, 37)}) % ${Mixture.Mod}"

  // ----------------------------------------------------------- mixture

  private val mixShares = Map(
    "en" -> 0.5, "fr" -> 0.2, "de" -> 0.2, "zh" -> 0.1) // es dropped
  private val mixTarget = 200L
  private val mixSeed = "mix42"

  /** Deterministic stratified downsampling to a target language
    * mixture; 'es' has no share and must vanish entirely. */
  private def dataMixture(s: SparkSession, dir: String): DataFrame =
    Mixture.sampleToMixture(
        Tables.documents(s, dir), "doc_id", "lang",
        mixShares, mixTarget, mixSeed)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  private val dataMixtureOracle = {
    val shareCase = mixShares.toSeq.sorted
      .map { case (g, r) => s"WHEN '$g' THEN CAST($r AS DOUBLE)" }
      .mkString(" ")
    s"""WITH n AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
       |r AS (SELECT lang, cnt, CASE lang $shareCase END AS share FROM n),
       |t AS (SELECT lang,
       |    CAST(floor(least(1.0, (CAST($mixTarget AS DOUBLE) * share) / CAST(cnt AS DOUBLE))
       |               * 2147483647) AS BIGINT) AS thr
       |  FROM r WHERE share IS NOT NULL)
       |SELECT d.doc_id, d.lang
       |FROM documents d JOIN t ON d.lang = t.lang
       |WHERE ${mixHashSql(s"'$mixSeed:' || CAST(d.doc_id AS VARCHAR)")} < t.thr
       |ORDER BY d.doc_id""".stripMargin
  }

  // ----------------------------------------- temperature mixture

  private val tempAlpha = 0.5
  private val tempTarget = 400L
  private val tempSeed = "temp7"

  /** Temperature-scaled (α = 0.5) language mixture — exponentiated
    * sampling smoothing (XLM / mBERT recipe): low-resource languages
    * upweight relative to their raw share. α = 0.5 makes every share
    * step a single correctly-rounded IEEE op (sqrt, ·, /) and both
    * engines sum in lang-sorted order, so the oracle reproduces the
    * doubles (and thus the integer thresholds) bit-for-bit. */
  private def mixtureTemperature(s: SparkSession, dir: String): DataFrame =
    Mixture.sampleByTemperature(
        Tables.documents(s, dir), "doc_id", "lang",
        tempAlpha, tempTarget, tempSeed)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  private val mixtureTemperatureOracle =
    s"""WITH n AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
       |z AS (SELECT list_reduce(
       |        list_prepend(CAST(0 AS DOUBLE),
       |          list(sqrt(CAST(cnt AS DOUBLE)) ORDER BY lang)),
       |        (a, b) -> a + b) AS zz FROM n),
       |t AS (SELECT lang, cnt,
       |    CAST(floor(least(1.0,
       |      (CAST($tempTarget AS DOUBLE) * (sqrt(CAST(cnt AS DOUBLE)) / zz))
       |        / CAST(cnt AS DOUBLE)) * ${Mixture.Mod}) AS BIGINT) AS thr
       |  FROM n, z)
       |SELECT d.doc_id, d.lang
       |FROM documents d JOIN t ON d.lang = t.lang
       |WHERE ${mixHashSql(s"'$tempSeed:' || CAST(d.doc_id AS VARCHAR)")} < t.thr
       |ORDER BY d.doc_id""".stripMargin

  // ----------------------------------------- stratified sample

  private val stratN = 30
  private val stratSeed = "strat3"

  /** Deterministic per-language sample of `stratN` docs: the seeded
    * acceptance hash orders each stratum, row_number cuts it — a
    * balanced eval pool carved reproducibly from any layout. */
  private def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.util.Sampling.stratifiedSample(
        Tables.documents(s, dir), "doc_id", "lang", stratN, stratSeed)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  private val stratifiedSampleOracle =
    s"""SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang ORDER BY
       |      ${mixHashSql(s"'$stratSeed:' || CAST(doc_id AS VARCHAR)")}, doc_id)
       |      AS rn
       |  FROM documents)
       |WHERE rn <= $stratN ORDER BY doc_id""".stripMargin

  // ----------------------------------------- length batching

  private val lenBatchSize = 16

  /** Padding-efficient length-grouped batching: docs in global
    * (char-length DESC, id) order cut into 16-doc batches via the
    * two-level scan (no single-task global window); per batch the
    * padding waste n·max − Σlen is what dynamic batching minimizes. */
  private def lengthBatches(s: SparkSession, dir: String): DataFrame =
    Packing.lengthBatches(
        Tables.documents(s, dir).withColumn("len", length(col("text"))),
        "doc_id", col("len"), lenBatchSize)
      .groupBy("batch")
      .agg(
        count(lit(1)).cast("int").as("n_docs"),
        max(col("len")).cast("long").as("max_len"),
        sum(col("len")).cast("long").as("sum_len"))
      .withColumn("padding_waste",
        col("n_docs") * col("max_len") - col("sum_len"))
      .orderBy("batch")

  private val lengthBatchesOracle =
    s"""WITH d AS (
       |  SELECT doc_id, length(text) AS len FROM documents
       |), r AS (
       |  SELECT doc_id, len,
       |    (row_number() OVER (ORDER BY len DESC, doc_id) - 1)
       |      // $lenBatchSize AS batch
       |  FROM d)
       |SELECT batch, CAST(count(*) AS INT) AS n_docs,
       |  CAST(max(len) AS BIGINT) AS max_len,
       |  CAST(sum(len) AS BIGINT) AS sum_len,
       |  CAST(count(*) * max(len) - sum(len) AS BIGINT) AS padding_waste
       |FROM r GROUP BY batch ORDER BY batch""".stripMargin

  // ----------------------------------------- z-order layout key

  /** Morton-interleave clustering key over (user bucket, hour-of-day):
    * the multi-column data-layout key (`sortWithinPartitions(z)`)
    * that lets BOTH user and time predicates prune parquet row groups.
    * The gate pins the exact bit math against a SQL replay. */
  private def zorderKey(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("x", pmod(col("user_id"), lit(256L)))
      .withColumn("y", pmod(
        floor(unix_micros(col("ts").cast("timestamp")) / 3600000000L), lit(256L)))
    e.select(col("event_id"), col("x"), col("y"),
        graft.ops.ZOrder.zorderKey(col("x"), col("y"), bits = 8).as("z"))
      .orderBy("event_id")
  }

  private val zorderKeyOracle =
    """WITH e AS (
      |  SELECT event_id,
      |    user_id % 256 AS x,
      |    (epoch_us(ts) // 3600000000) % 256 AS y
      |  FROM events
      |)
      |SELECT event_id, x, y,
      |  CAST(list_sum(list_transform(range(0, 8), b ->
      |    ((x // (CAST(1 AS BIGINT) << b)) % 2) * (CAST(1 AS BIGINT) << (2*b)) +
      |    ((y // (CAST(1 AS BIGINT) << b)) % 2) * (CAST(1 AS BIGINT) << (2*b+1))))
      |    AS BIGINT) AS z
      |FROM e ORDER BY event_id""".stripMargin

  /** N-ary Z-order budgets for the gate: (user bucket 6 bits, hour
    * 5 bits, type bucket 3 bits) — deliberately unequal so the
    * round-robin position assignment (not just the strided 2-ary
    * special case) is what the SQL replay pins. */
  private val zorderNBudgets = Seq(6, 5, 3)

  /** (colIdx, level, outPos) triples of the round-robin interleave —
    * the same assignment [[graft.ops.ZOrder.zorderKeyN]] unrolls, made
    * explicit here so the oracle emits literal bit positions. */
  private def zorderNPositions: Seq[(Int, Int, Int)] = {
    var pos = 0
    for {
      level <- 0 until zorderNBudgets.max
      i <- zorderNBudgets.indices
      if level < zorderNBudgets(i)
    } yield { val p = pos; pos += 1; (i, level, p) }
  }

  /** 3-ary Morton key over (user bucket, hour-of-day, event-type
    * bucket) with per-dimension bit budgets — the layout key a real
    * events table wants (`sortWithinPartitions(z)` prunes row groups
    * for user AND time AND type predicates). Bit math pinned against
    * a literal SQL replay of the same positions. */
  private def zorderNKey(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("x", pmod(col("user_id"), lit(64L)))
      .withColumn("y", pmod(
        floor(unix_micros(col("ts").cast("timestamp")) / 3600000000L), lit(32L)))
      .withColumn("t", pmod(ascii(substring(col("event_type"), 1, 1)), lit(8)))
    e.select(col("event_id"), col("x"), col("y"), col("t"),
        graft.ops.ZOrder.zorderKeyN(
          Seq(col("x") -> 6, col("y") -> 5, col("t") -> 3)).as("z"))
      .orderBy("event_id")
  }

  private val zorderNKeyOracle: String = {
    val cols = Seq("x", "y", "t")
    val terms = zorderNPositions.map { case (i, level, p) =>
      s"((${cols(i)} // (CAST(1 AS BIGINT) << $level)) % 2) * (CAST(1 AS BIGINT) << $p)"
    }.mkString(" +\n      |  ")
    s"""WITH e AS (
       |  SELECT event_id,
       |    user_id % 64 AS x,
       |    (epoch_us(ts) // 3600000000) % 32 AS y,
       |    ascii(substr(event_type, 1, 1)) % 8 AS t
       |  FROM events
       |)
       |SELECT event_id, x, y, t,
       |  CAST($terms AS BIGINT) AS z
       |FROM e ORDER BY event_id""".stripMargin
  }

  // ----------------------------------------- corpus snapshot diff

  /** Snapshot diff audit: the "new" corpus derives from documents by a
    * deterministic edit script (drop doc_id%97=3, append ' v2' where
    * %101=5, add three fresh ids) — every id must classify
    * added/removed/changed/unchanged. The engine compares 64-bit
    * content hashes; the oracle compares the text itself — identical
    * output absent an xxhash64 collision, which the gate would surface
    * loudly. */
  private def corpusDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val old = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val added = Seq(
      (10000001L, "fresh document one"),
      (10000002L, "fresh document two"),
      (10000003L, "fresh document three")).toDF("doc_id", "text")
    val neu = old
      .where(pmod(col("doc_id"), lit(97)) =!= 3)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(101)) === 5, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .unionByName(added)
    graft.ops.CorpusDiff.diff(old, neu, "doc_id", "text")
      .orderBy("id")
  }

  private val corpusDiffOracle =
    """WITH o AS (SELECT doc_id AS id, text FROM documents),
      |n AS (
      |  SELECT doc_id AS id,
      |    CASE WHEN doc_id % 101 = 5 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 97 <> 3
      |  UNION ALL
      |  SELECT * FROM (VALUES (10000001, 'fresh document one'),
      |    (10000002, 'fresh document two'),
      |    (10000003, 'fresh document three')) AS a(id, text)
      |)
      |SELECT coalesce(o.id, n.id) AS id,
      |  CASE WHEN o.id IS NULL THEN 'added'
      |       WHEN n.id IS NULL THEN 'removed'
      |       WHEN o.text <> n.text THEN 'changed'
      |       ELSE 'unchanged' END AS status
      |FROM o FULL OUTER JOIN n ON o.id = n.id
      |ORDER BY id""".stripMargin

  // ----------------------------------------------------------- packing

  private val blockSize = 512

  /** GPT-style concat-and-chunk: global token offsets + the block span
    * of every doc, via the two-level distributed prefix sum. */
  private def packBlocks(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        size(tokenize(col("text"))).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
    Packing.assignBlocks(toks, col("n_tokens"), blockSize, Seq(col("doc_id")))
      .select(col("doc_id"), col("n_tokens"), col("start_token"),
        col("first_block"), col("last_block"))
      .orderBy(col("doc_id"))
  }

  private val packBlocksOracle =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM documents WHERE text IS NOT NULL),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
       |  FROM t WHERE n_tokens > 0)
       |SELECT doc_id, n_tokens, run - n_tokens AS start_token,
       |  CAST(floor(CAST(run - n_tokens AS DOUBLE) / $blockSize) AS BIGINT) AS first_block,
       |  CAST(floor(CAST(run - 1 AS DOUBLE) / $blockSize) AS BIGINT) AS last_block
       |FROM c ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ shards

  private val shardRows = 64
  private val shardSeed = "shuf42"

  /** Deterministic seeded global shuffle cut into fixed-row shards. */
  private def exportShards(s: SparkSession, dir: String): DataFrame =
    Packing.shuffledShards(
        Tables.documents(s, dir).select(col("doc_id")),
        "doc_id", shardRows, shardSeed)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("doc_id"))

  private val exportShardsOracle =
    s"""WITH h AS (
       |  SELECT doc_id,
       |    ${mixHashSql(s"'$shardSeed:' || CAST(doc_id AS VARCHAR)")} AS hs
       |  FROM documents),
       |r AS (SELECT doc_id, row_number() OVER (ORDER BY hs, doc_id) AS rk FROM h)
       |SELECT doc_id,
       |  CAST(floor(CAST(rk - 1 AS DOUBLE) / $shardRows) AS BIGINT) AS shard,
       |  CAST((rk - 1) % $shardRows AS BIGINT) AS pos
       |FROM r ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- classify

  private val classifyK = 5

  /** kNN majority-vote labeling: every 5th embedding is a labeled
    * seed; the rest are classified map-side against the broadcast
    * seed set (cosine, ties by (dist, seed_id), vote ties to the
    * smallest label). */
  private def knnClassify(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    KnnClassify.classify(
        e.where(col("vec_id") % 5 =!= 0), "vec_id", "embedding",
        e.where(col("vec_id") % 5 === 0), "vec_id", "embedding", "label",
        k = classifyK)
      .orderBy(col("id"))
  }

  private val knnClassifyOracle = {
    val dot =
      "list_sum(list_transform(list_zip(d.embedding, s.sv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    def norm(c: String) =
      s"sqrt(list_sum(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"""WITH d AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 0),
       |s AS (SELECT vec_id AS sid, embedding AS sv, label FROM embeddings WHERE vec_id % 5 = 0),
       |p AS (SELECT d.vec_id AS id, s.sid, s.label,
       |    1.0 - $dot / (${norm("d.embedding")} * ${norm("s.sv")}) AS dist
       |  FROM d, s),
       |r AS (SELECT id, sid, label,
       |    row_number() OVER (PARTITION BY id ORDER BY dist, sid) AS rk FROM p),
       |topk AS (SELECT * FROM r WHERE rk <= $classifyK),
       |v AS (SELECT id, label, CAST(count(*) AS INT) AS votes
       |  FROM topk GROUP BY id, label),
       |pick AS (SELECT id, label, votes,
       |    row_number() OVER (PARTITION BY id ORDER BY votes DESC, label) AS pk
       |  FROM v),
       |nn AS (SELECT id, sid AS nn_id FROM topk WHERE rk = 1)
       |SELECT pick.id, pick.label, pick.votes, nn.nn_id
       |FROM pick JOIN nn USING (id) WHERE pk = 1
       |ORDER BY pick.id""".stripMargin
  }

  // ------------------------------------------------------------- vocab

  private val vocabK = 50

  /** Head-of-vocabulary coverage profile. */
  private def vocabCoverage(s: SparkSession, dir: String): DataFrame =
    CorpusStats.vocabulary(Tables.documents(s, dir), "text", vocabK)
      .orderBy(col("rank"))

  private val vocabCoverageOracle =
    s"""WITH tok AS (
       |  SELECT u.t AS token
       |  FROM documents, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS u(t)
       |  WHERE text IS NOT NULL),
       |c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
       |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c),
       |top AS (
       |  SELECT token, cnt,
       |    row_number() OVER (ORDER BY cnt DESC, token) AS rank,
       |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum
       |  FROM c)
       |SELECT token, cnt, rank,
       |  round(cum / tot.total, 6) AS cum_share
       |FROM top, tot
       |WHERE rank <= $vocabK
       |ORDER BY rank""".stripMargin

  // ------------------------------------------------------ dataset split

  private val splitSeed = "split42"
  private val splitWeights =
    Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

  /** Deterministic train/val/test assignment for every doc. The
    * cumulative integer thresholds are computed ONCE in Scala and
    * interpolated into the oracle, so double-summation of the weights
    * can never diverge between engines. */
  private def datasetSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Mixture.assignSplits(col("doc_id"), splitSeed, splitWeights)
          .as("split"))
      .orderBy("doc_id")

  private val datasetSplitOracle: String = {
    val cum = splitWeights.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(Mixture.threshold)
    val h = mixHashSql(s"'$splitSeed:' || CAST(doc_id AS VARCHAR)")
    val cases = splitWeights.init.zip(cum.init)
      .map { case ((name, _), t) => s"WHEN $h < $t THEN '$name'" }
      .mkString(" ")
    s"""SELECT doc_id,
       |  CASE $cases ELSE '${splitWeights.last._1}' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  def all: Seq[QueryDef] = Seq(
    QueryDef("data_mixture", Some(dataMixtureOracle), dataMixture),
    QueryDef("mixture_temperature", Some(mixtureTemperatureOracle), mixtureTemperature),
    QueryDef("stratified_sample", Some(stratifiedSampleOracle), stratifiedSample),
    QueryDef("length_batches", Some(lengthBatchesOracle), lengthBatches),
    QueryDef("zorder_key", Some(zorderKeyOracle), zorderKey),
    QueryDef("zorder_key_nary", Some(zorderNKeyOracle), zorderNKey),
    QueryDef("corpus_diff", Some(corpusDiffOracle), corpusDiff),
    QueryDef("dataset_split", Some(datasetSplitOracle), datasetSplit),
    QueryDef("pack_blocks", Some(packBlocksOracle), packBlocks),
    QueryDef("export_shards", Some(exportShardsOracle), exportShards),
    QueryDef("knn_classify", Some(knnClassifyOracle), knnClassify),
    QueryDef("vocab_coverage", Some(vocabCoverageOracle), vocabCoverage))
}
