package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.MultiVec

/** Driver-checkable queries for late-interaction multi-vector
  * retrieval ([[graft.ops.MultiVec]] — ColBERT MaxSim + PLAID-style
  * centroid pruning; the multi-vector sibling of the dense-kNN and
  * learned-sparse gate families).
  *
  * Fixture: `toksPerDoc = 4` consecutive `vec_id`s of the embeddings
  * table form one multi-vector document. The two exact gates score
  * corpus docs against doc 0's token matrix on two different physical
  * paths and share ONE dense SQL oracle (the thresholded maxsim
  * replayed term-for-term); the PLAID gates use the multi-query recall
  * protocol over 8 held-out query docs, plus an explicit
  * did-it-actually-prune assertion.
  */
object MultiVecQueries {

  private val T = 4
  private val K = 10

  private def toks(s: SparkSession, dir: String): DataFrame =
    MultiVec.tokens(Tables.embeddings(s, dir), "vec_id", "embedding", T)

  /** Rounded-score cut, single-query form: the same no-raw-boundary
    * protocol as the sparse/bm25 gates. */
  private def cut(scored: DataFrame): DataFrame =
    scored
      .withColumn("score", round(col("score"), 4))
      .orderBy(col("score").desc, col("mdoc"))
      .limit(K)
      .select("mdoc", "score")

  /** Exact MaxSim, flat token-table path (one corpus pass, stacked
    * query matrix in a single codegen'd projection). */
  private def maxsimFlat(s: SparkSession, dir: String): DataFrame = {
    val t = toks(s, dir)
    val q = MultiVec.queryToks(t, Seq(0L))
    cut(MultiVec.scoreFlat(t.where(col("mdoc") =!= 0), q)
      .select(col("mdoc"), col("score")))
  }

  /** Exact MaxSim, per-document array path (codegen'd
    * [[graft.functions.MaxSimScore]] kernel) — same oracle as the flat
    * path: the two physical shapes must produce identical rows. */
  private def maxsimDoc(s: SparkSession, dir: String): DataFrame = {
    val t = toks(s, dir)
    val qm = MultiVec.queryToks(t, Seq(0L)).map(_._3)
    cut(MultiVec.scoreDocs(
      MultiVec.docArrays(t.where(col("mdoc") =!= 0)), qm))
  }

  /** Shared exact oracle: per (doc, query-token) max dot over the
    * doc's tokens, then the ordered per-doc sum — every double
    * reproduced term-for-term (sequential ascending-index dot, exact
    * max, ascending query-token fold). */
  private val maxsimOracle: String =
    s"""WITH toks AS (
      |  SELECT vec_id // $T AS mdoc, vec_id % $T AS t_idx, embedding AS tok
      |  FROM embeddings),
      |q AS (SELECT t_idx AS q_t, tok AS qv FROM toks WHERE mdoc = 0),
      |dots AS (
      |  SELECT d.mdoc, q.q_t,
      |    MAX(list_sum(list_transform(list_zip(d.tok, q.qv),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))) AS m
      |  FROM toks d, q WHERE d.mdoc <> 0
      |  GROUP BY d.mdoc, q.q_t),
      |sc AS (
      |  SELECT mdoc, ROUND(list_sum(list(m ORDER BY q_t)), 4) AS score
      |  FROM dots GROUP BY mdoc)
      |SELECT mdoc, score FROM sc ORDER BY score DESC, mdoc LIMIT $K
      |""".stripMargin

  /** Cosine MaxSim — ColBERT's own convention: tokens unit-normalized
    * at derivation (codegen'd kernel), so the dot IS the cosine. Same
    * flat physical path; the oracle replays the normalization
    * term-for-term (sequential double norm, double divide, float
    * round-trip) before the max-dot CTE. Zero-norm tokens are outside
    * the replay contract: the kernel passes them through unchanged
    * while SQL's x/sqrt(0) is NULL — the test fixtures contain none
    * (a mismatch would surface as a loud hash failure, not silence). */
  private def maxsimCos(s: SparkSession, dir: String): DataFrame = {
    val t = MultiVec.tokens(Tables.embeddings(s, dir), "vec_id", "embedding",
      T, normalize = true)
    val q = MultiVec.queryToks(t, Seq(0L))
    cut(MultiVec.scoreFlat(t.where(col("mdoc") =!= 0), q)
      .select(col("mdoc"), col("score")))
  }

  private val maxsimCosOracle: String =
    s"""WITH toks AS (
      |  SELECT vec_id // $T AS mdoc, vec_id % $T AS t_idx,
      |    list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) /
      |      sqrt(list_sum(list_transform(embedding,
      |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS FLOAT)) AS tok
      |  FROM embeddings),
      |q AS (SELECT t_idx AS q_t, tok AS qv FROM toks WHERE mdoc = 0),
      |dots AS (
      |  SELECT d.mdoc, q.q_t,
      |    MAX(list_sum(list_transform(list_zip(d.tok, q.qv),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))) AS m
      |  FROM toks d, q WHERE d.mdoc <> 0
      |  GROUP BY d.mdoc, q.q_t),
      |sc AS (
      |  SELECT mdoc, ROUND(list_sum(list(m ORDER BY q_t)), 4) AS score
      |  FROM dots GROUP BY mdoc)
      |SELECT mdoc, score FROM sc ORDER BY score DESC, mdoc LIMIT $K
      |""".stripMargin

  /** PLAID gate parameters: 64 token centroids, 16 probes per query
    * token (np/k = 25% of lists per token — gate-scale generous; real
    * deployments run ~2^16 lists with np ≈ 4), stage-1 candidate
    * budget 64 docs per query — the rerank sees a fixed small fraction
    * of the corpus by construction while the i8 approximation holds
    * the recall bar with ≥ 0.10 margin at every sf (measured
    * 0.90–0.95). */
  private val QDocs = 8
  private val Centroids = 64
  private val Nprobe = 16
  private val CandPerQuery = 64

  private def recallMaps(df: DataFrame): Map[Long, Set[Long]] =
    RecallProtocol.perQuery(df.select("q_mdoc", "mdoc").collect()
      .map(r => (r.getLong(0), r.getLong(1))))

  /** Multi-query recall gate for the in-memory PLAID path: mean
    * recall@10 over 8 query docs ≥ 0.8, with the stage-1 candidate
    * budget strictly below the corpus size (the rerank provably never
    * sees every doc). */
  private def plaidRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = toks(s, dir)
    val q = MultiVec.queryToks(t, (0L until QDocs.toLong))
    val corpus = t.where(col("mdoc") >= QDocs)
    val exact = recallMaps(
      MultiVec.topKPerQuery(MultiVec.scoreFlat(corpus, q), K))
    val cents = MultiVec.trainCentroids(t, Centroids)
    val assigned = MultiVec.assign(corpus, cents)
    val probes = MultiVec.probeSets(q, cents, Nprobe)
    val nDocs = corpus.select("mdoc").distinct().count()
    val ann = recallMaps(MultiVec.topKPerQuery(
      MultiVec.plaidSearch(assigned, q, probes, CandPerQuery), K))
    if (CandPerQuery < nDocs &&
      RecallProtocol.meanRecallOk(ann, exact)) Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  /** On-disk PLAID twin: stage 1 runs over the PRUNED
    * centroid-partitioned postings read (partition + column pruning);
    * the gate asserts the disk path's per-query top-10 is IDENTICAL to
    * the in-memory path's (same probes, deterministic assignment ⇒
    * bit-equal scores). */
  private def plaidPruned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = toks(s, dir)
    val q = MultiVec.queryToks(t, (0L until QDocs.toLong))
    val corpus = t.where(col("mdoc") >= QDocs)
    val cents = MultiVec.trainCentroids(t, Centroids)
    val assigned = MultiVec.assign(corpus, cents)
    val probes = MultiVec.probeSets(q, cents, Nprobe)
    val path = AnnQueries.artifactDir("mvpost", dir, "embeddings")
    AnnQueries.cached(path) {
      MultiVec.writeTokenPostings(assigned, path)
    }
    val disk = MultiVec.topKPerQuery(
      MultiVec.plaidSearchOnDisk(s, path, q, probes, CandPerQuery), K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val mem = MultiVec.topKPerQuery(
      MultiVec.plaidSearch(assigned, q, probes, CandPerQuery), K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    if (disk.nonEmpty && disk == mem) Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  /** Streaming twin: the multi-vector inverted file maintained
    * INCREMENTALLY — index built over the first half of the corpus
    * docs (centroids trained once there), the remaining docs arriving
    * as file-source micro-batches whose tokens are assigned with the
    * PERSISTED centroids and appended into the centroid directories
    * ([[graft.ops.MultiVec.appendToIndex]], the `aminsert` analog).
    * Stage-1 max and the ascending-query fold are file-order-
    * independent, so exact MaxSim over the streamed postings must
    * hash-match the SAME full-SQL oracle as the batch paths — with a
    * token-count fail-fast against silently dropped batches. */
  private def streamingMultivecInsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val t = toks(s, dir)
    val corpusToks = t.where(col("mdoc") =!= 0)
    val maxDoc = t.agg(max(col("mdoc"))).head().getLong(0)
    val half = maxDoc / 2
    // 16 lists: the gate's contract is exact post-append scoring, so
    // the directory fan-out only costs write/listing time here
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft-mvins").toString + "/idx"
    // the fail-fast corpus token count never touches the index —
    // overlap it with the build + stream chain below
    val nToksF = RecallProtocol.async(corpusToks.count())
    MultiVec.writeIndex(
      corpusToks.where(col("mdoc") <= half), idxPath, nlists = 16)
    // the daemon shape: centroids loaded once, reused every micro-batch
    val cents = MultiVec.loadCentroids(s, idxPath)

    // stream the raw embedding rows of docs (half, maxDoc] in three
    // vec_id-range chunks — chunk boundaries need not align to doc
    // boundaries: appends accumulate per-token
    val lo = (half + 1) * T
    val hi = (maxDoc + 1) * T
    val rest = e.where(col("vec_id") >= lo && col("vec_id") < hi)
    val width = (hi - lo) / 3 + 1
    val chunkRoot = AnnQueries.artifactDir("mvins", dir, "embeddings")
    val files = StreamChunks.materialize(chunkRoot,
      (0 until 3).map { c => () =>
        rest.where(col("vec_id") >= lo + c * width &&
          col("vec_id") < lo + (c + 1) * width)
      })
    val (streamDir, src) = StreamChunks.source(s, rest.schema)
    val q = src.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) MultiVec.appendTokenPostings(
          MultiVec.assign(
            MultiVec.tokens(b, "vec_id", "embedding", T), cents),
          s"$idxPath/postings")
      }
      .start()
    StreamChunks.drive(q, streamDir, files)

    val post = s.read.parquet(s"$idxPath/postings")
    if (post.count() != nToksF()) {
      // a dropped micro-batch must fail the hash compare loudly
      Seq.empty[(Long, Double)].toDF("mdoc", "score")
    } else {
      cut(MultiVec.scoreFlat(post.select("mdoc", "t_idx", "tok"),
        MultiVec.queryToks(t, Seq(0L))))
    }
  }

  /** MaxSim PLANNER gate — the scalar ORDER-BY form: a doc-array table
    * registered `kind = "multivec"` answers
    * `orderBy(maxsim_score(toks, Q).desc).limit(k)` through PLAID
    * stage-1 candidates + exact join-back rescore (the bq
    * pre-rank/rescore shape, descending). Multi-query protocol: all 8
    * held-out query docs run the FULL optimizer round-trip; the gate is
    * the plan assertion on every query plus mean recall@10 ≥ 0.8 vs the
    * exact batched truth. */
  private def maxsimPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.AnnCatalog
    val t = toks(s, dir)
    val q = MultiVec.queryToks(t, (0L until QDocs.toLong))
    val corpus = t.where(col("mdoc") >= QDocs)
    val exact = recallMaps(
      MultiVec.topKPerQuery(MultiVec.scoreFlat(corpus, q), K))

    val idxPath = AnnQueries.artifactDir("mvpidx", dir, "embeddings")
    AnnQueries.cached(idxPath) {
      MultiVec.writeIndex(corpus, s"$idxPath/idx", Centroids)
    }
    val docsPath = AnnQueries.artifactDir("mvdocs", dir, "embeddings")
    AnnQueries.cached(docsPath) {
      MultiVec.docArrays(corpus).write.mode("overwrite")
        .parquet(s"$docsPath/docs")
    }
    AnnCatalog.register(s, s"$docsPath/docs", AnnCatalog.IndexMeta(
      s"$idxPath/idx", "mdoc", "toks", "maxsim",
      ef = CandPerQuery, kind = "multivec", nprobe = Nprobe))
    try {
      val docs = s.read.parquet(s"$docsPath/docs")
      val byQ = q.groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3)).toMap
      val ann = RecallProtocol.probed(0L until QDocs.toLong) { qd =>
        val top = docs
          .orderBy(MultiVec.maxsimCol(col("toks"), byQ(qd)).desc)
          .limit(K)
        // every round-trip must serve through the index rewrite
        if (!top.queryExecution.optimizedPlan.toString.contains("MaxSimIds"))
          qd -> Set.empty[Long]
        else qd -> top.select("mdoc").collect().map(_.getLong(0)).toSet
      }.toMap
      if (RecallProtocol.meanRecallOk(ann, exact)) Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
      // a leaked registration would surface in UNRELATED gates (the
      // maintain sweep walks the whole catalog) — always clean up
    } finally AnnCatalog.unregister(s, s"$docsPath/docs")
  }

  /** FILTERED maxsim planner gate: `WHERE pred ORDER BY maxsim DESC
    * LIMIT k` over the same registration routes through
    * [[graft.plans.MaxSimIdsLogical]] with the captured predicate —
    * the adaptive over-fetch loop (candidate budget quadruples until
    * the 1-in-3 predicate's survivors fill k, exact filtered scan as
    * the terminal guarantee). Same multi-query contract as the scalar
    * form, against the exact FILTERED truth. */
  private def maxsimFilteredPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.AnnCatalog
    val t = toks(s, dir)
    val q = MultiVec.queryToks(t, (0L until QDocs.toLong))
    val corpus = t.where(col("mdoc") >= QDocs)
    val exact = recallMaps(MultiVec.topKPerQuery(
      MultiVec.scoreFlat(corpus.where(col("mdoc") % 3 === 1), q), K))
    val idxPath = AnnQueries.artifactDir("mvpidx", dir, "embeddings")
    AnnQueries.cached(idxPath) {
      MultiVec.writeIndex(corpus, s"$idxPath/idx", Centroids)
    }
    val docsPath = AnnQueries.artifactDir("mvdocs", dir, "embeddings")
    AnnQueries.cached(docsPath) {
      MultiVec.docArrays(corpus).write.mode("overwrite")
        .parquet(s"$docsPath/docs")
    }
    AnnCatalog.register(s, s"$docsPath/docs", AnnCatalog.IndexMeta(
      s"$idxPath/idx", "mdoc", "toks", "maxsim",
      ef = CandPerQuery, kind = "multivec", nprobe = Nprobe))
    try {
      val docs = s.read.parquet(s"$docsPath/docs")
      val byQ = q.groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3)).toMap
      val ann = RecallProtocol.probed(0L until QDocs.toLong) { qd =>
        val top = docs
          .where(col("mdoc") % 3 === 1)
          .orderBy(MultiVec.maxsimCol(col("toks"), byQ(qd)).desc,
            col("mdoc"))
          .limit(K)
        val fired = top.queryExecution.optimizedPlan.collect {
          case m: graft.plans.MaxSimIdsLogical if m.pred.isDefined => m
        }.nonEmpty
        if (!fired) qd -> Set.empty[Long]
        else qd -> top.select("mdoc").collect().map(_.getLong(0)).toSet
      }.toMap
      if (RecallProtocol.meanRecallOk(ann, exact)) Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally AnnCatalog.unregister(s, s"$docsPath/docs")
  }

  /** MaxSim LATERAL planner gate — the correlated kNN-join form:
    * `FROM probes p, LATERAL (SELECT mdoc FROM docs ORDER BY
    * maxsim_score(toks, p.qtoks) DESC LIMIT k)` (which vanilla Spark
    * rejects at analysis) must rewrite through
    * [[graft.plans.AnnKnnJoinLogical]] with `kind = "multivec"` — ALL
    * probe docs batched through ONE PLAID stage-1 + rerank pass
    * ([[graft.ops.MultiVec.searchManyOnDisk]]) — and hold mean
    * per-probe recall@10 ≥ 0.8 vs the exact batched MaxSim truth. */
  private def maxsimJoinPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.AnnCatalog
    val t = toks(s, dir)
    val q = MultiVec.queryToks(t, (0L until QDocs.toLong))
    val corpus = t.where(col("mdoc") >= QDocs)
    val exact = recallMaps(
      MultiVec.topKPerQuery(MultiVec.scoreFlat(corpus, q), K))
    // shared artifacts with the scalar maxsim planner gate
    val idxPath = AnnQueries.artifactDir("mvpidx", dir, "embeddings")
    AnnQueries.cached(idxPath) {
      MultiVec.writeIndex(corpus, s"$idxPath/idx", Centroids)
    }
    val docsPath = AnnQueries.artifactDir("mvdocs", dir, "embeddings")
    AnnQueries.cached(docsPath) {
      MultiVec.docArrays(corpus).write.mode("overwrite")
        .parquet(s"$docsPath/docs")
    }
    AnnCatalog.register(s, s"$docsPath/docs", AnnCatalog.IndexMeta(
      s"$idxPath/idx", "mdoc", "toks", "maxsim",
      ef = CandPerQuery, kind = "multivec", nprobe = Nprobe))
    val probesView = "graft_mvjp_probes"
    val docsView = "graft_mvjp_docs"
    try {
      MultiVec.docArrays(t.where(col("mdoc") < QDocs))
        .select(col("mdoc").as("q_mdoc"), col("toks").as("qtoks"))
        .createOrReplaceTempView(probesView)
      s.read.parquet(s"$docsPath/docs").createOrReplaceTempView(docsView)
      val qdf = s.sql(
        s"""SELECT p.q_mdoc AS query_id, t.mdoc AS neighbor_id
           |FROM $probesView p,
           |LATERAL (
           |  SELECT mdoc FROM $docsView
           |  ORDER BY maxsim_score(toks, p.qtoks) DESC LIMIT $K
           |) t""".stripMargin)
      val planned = qdf.queryExecution.optimizedPlan.collect {
        case a: graft.plans.AnnKnnJoinLogical if a.kind == "multivec" => a
      }.nonEmpty
      val ann = RecallProtocol.perQuery(
        qdf.collect().map(r => (r.getLong(0), r.getLong(1))))
      if (planned && RecallProtocol.meanRecallOk(ann, exact))
        Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally {
      AnnCatalog.unregister(s, s"$docsPath/docs")
      s.catalog.dropTempView(probesView)
      s.catalog.dropTempView(docsView)
      ()
    }
  }

  /** Consolidation gate — the full maintenance lifecycle in one pass:
    * build over the first half, APPEND the second half, DELETE docs
    * 1–3 (tombstones), CONSOLIDATE (compaction + physical delete +
    * tombstone reset), then exact MaxSim over the compacted postings
    * must hash-match the oracle over the corpus MINUS the deleted docs
    * — with structural fail-fasts that compaction actually landed (one
    * file per centroid directory, tombstone dir gone). */
  private val Deleted = Seq(1L, 2L, 3L)

  private def multivecConsolidate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = toks(s, dir)
    val corpusToks = t.where(col("mdoc") =!= 0)
    val half = t.agg(max(col("mdoc"))).head().getLong(0) / 2
    // the query-doc tokens never touch the index — overlap their
    // fetch with the build/append/delete/consolidate chain
    val qToksF = RecallProtocol.async(MultiVec.queryToks(t, Seq(0L)))
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft-mvcons").toString + "/idx"
    MultiVec.writeIndex(
      corpusToks.where(col("mdoc") <= half), idxPath, nlists = 16)
    MultiVec.appendToIndex(s, idxPath, corpusToks.where(col("mdoc") > half))
    MultiVec.deleteDocs(s, idxPath, Deleted)
    MultiVec.consolidateIndex(s, idxPath)

    // post-consolidate the postings serve from the committed
    // generation dir; the structural check must look at what SERVES
    val served = new java.net.URI(MultiVec.postingsDir(s, idxPath)).getPath
    val centDirs = new java.io.File(served).listFiles()
      .filter(_.getName.startsWith("cent="))
    val compacted = centDirs.nonEmpty && centDirs.forall(
      _.listFiles().count(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith(".")) == 1)
    val tombGone = !new java.io.File(s"$idxPath/tombstones").exists()
    if (!compacted || !tombGone) {
      try qToksF() catch { case _: Throwable => () } // drain the overlap
      Seq.empty[(Long, Double)].toDF("mdoc", "score")
    } else {
      cut(MultiVec.scoreFlat(
        s.read.parquet(served).select("mdoc", "t_idx", "tok"),
        qToksF()))
    }
  }

  private val consolidateOracle: String =
    s"""WITH toks AS (
      |  SELECT vec_id // $T AS mdoc, vec_id % $T AS t_idx, embedding AS tok
      |  FROM embeddings),
      |q AS (SELECT t_idx AS q_t, tok AS qv FROM toks WHERE mdoc = 0),
      |dots AS (
      |  SELECT d.mdoc, q.q_t,
      |    MAX(list_sum(list_transform(list_zip(d.tok, q.qv),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))) AS m
      |  FROM toks d, q WHERE d.mdoc <> 0 AND d.mdoc NOT IN (1, 2, 3)
      |  GROUP BY d.mdoc, q.q_t),
      |sc AS (
      |  SELECT mdoc, ROUND(list_sum(list(m ORDER BY q_t)), 4) AS score
      |  FROM dots GROUP BY mdoc)
      |SELECT mdoc, score FROM sc ORDER BY score DESC, mdoc LIMIT $K
      |""".stripMargin

  /** PLAID serving-knob autotune gate
    * ([[graft.ann.Autotune.autotuneMultivec]]): one index build, every
    * (nprobe, cand) variant measured by one batched searchIndex.
    * Recorded-spec check mirroring `autotune_bq`: the persisted report
    * must contain the whole grid, pick exactly the FIRST variant
    * meeting the target with all cheaper variants below it, and at
    * fixed nprobe recall must be non-decreasing in cand — a
    * deterministic property (nested candidate sets under an exact
    * rerank), so a violation means the sweep is broken. */
  private def multivecAutotune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.Autotune
    val target = 0.9
    val grid = Autotune.DefaultMvGrid
    val reportPath = AnnQueries.artifactDir("mvtune", dir, "embeddings")
    AnnQueries.cached(reportPath) {
      val rep = Autotune.autotuneMultivec(toks(s, dir),
        queryCount = 5, targetRecall = target, grid = grid)
      Autotune.mvReportDf(s, rep)
        .write.mode("overwrite").parquet(s"$reportPath/report")
    }
    val rows = s.read.parquet(s"$reportPath/report").collect()
      .map(r => (Autotune.MvVariant(r.getAs[Int]("nprobe"), r.getAs[Int]("cand")),
        r.getAs[Double]("recall"), r.getAs[Boolean]("picked")))
    val byVariant = rows.map(v => v._1 -> v).toMap
    val ordered = grid.map(byVariant.get).flatten
    val ruleOk = ordered.length == grid.length && {
      val recalls = ordered.map(_._2)
      val picks = ordered.map(_._3)
      val firstQualifying = recalls.indexWhere(_ >= target)
      firstQualifying >= 0 && picks.count(identity) == 1 &&
        picks(firstQualifying) &&
        recalls.take(firstQualifying).forall(_ < target)
    }
    val candMonotone = ordered.groupBy(_._1.nprobe).values.forall { g =>
      g.sortBy(_._1.cand).map(_._2).sliding(2)
        .forall(p => p.length < 2 || p(0) <= p(1) + 1e-9)
    }
    if (ruleOk && candMonotone) Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  /** Retune gate for the paired-knob multivec kind
    * ([[graft.ann.Retune.retuneMultivec]] — the `retune_budget`
    * protocol applied to the maxsim planner form): the registration is
    * STARVED on both knobs (cand = k, nprobe = 1 of 64 lists), the
    * sweep widens both by one doubling factor through the planner's
    * rewrite against the exact MaxSim truth — ONE batched corpus pass
    * ([[graft.ops.MultiVec.maxsimJoinExact]]), registration lifted for
    * it — and the first qualifying factor re-registers BOTH knobs
    * proportionally. A confirmation pass over the updated registration
    * must qualify at its first step. Finally the FILTERED maxsim form
    * (the one the sf1 scale probes showed starving first) is retuned
    * under its own predicate: retuneMultivec throws mid-sweep if the
    * filtered form ever stops rewriting, so a green row also certifies
    * the predicate-scoped serving path end-to-end. */
  private def retuneMultivecGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.Retune
    import graft.plans.AnnCatalog
    val target = 0.8
    val t = toks(s, dir)
    val corpus = t.where(col("mdoc") >= QDocs)
    val idxPath = AnnQueries.artifactDir("mvpidx", dir, "embeddings")
    AnnQueries.cached(idxPath) {
      MultiVec.writeIndex(corpus, s"$idxPath/idx", Centroids)
    }
    val docsPath = AnnQueries.artifactDir("mvdocs", dir, "embeddings")
    AnnQueries.cached(docsPath) {
      MultiVec.docArrays(corpus).write.mode("overwrite")
        .parquet(s"$docsPath/docs")
    }
    val tbl = s"$docsPath/docs"
    // starved on both knobs (first step must measure below target) but
    // only 2-3 doublings from the qualifying budget — the sweep pays
    // for the steps that prove the protocol, not for a deeper hole
    val (cand0, np0) = (4 * K, 4)
    AnnCatalog.register(s, tbl, AnnCatalog.IndexMeta(s"$idxPath/idx",
      "mdoc", "toks", "maxsim", ef = cand0, kind = "multivec",
      nprobe = np0))
    try {
      val r = Retune.retuneMultivec(s, tbl, "toks", k = K,
        queryCount = 5, targetRecall = target, maxWiden = 64)
      val sweepOk = r.knob == "cand+nprobe" && r.registered == cand0 &&
        r.steps.head.recall < target &&
        r.picked.isDefined && r.updated &&
        r.steps.init.forall(_.recall < target) &&
        r.steps.last.recall >= target && {
          val m = AnnCatalog.metaFor(s, tbl, "toks", "maxsim").get
          m.ef == r.picked.get && m.nprobe == np0 * (r.picked.get / cand0)
        }
      // the confirmation doubles as the FILTERED-form certification:
      // the updated registration, retuned against the filtered
      // workload (sampled queries satisfy the predicate, truth scoped
      // to it, every step must rewrite through the filtered planner
      // form or retuneMultivec throws), must qualify at its FIRST step
      // — the serving-restart contract under the harder workload
      val filtered = Retune.retuneMultivec(s, tbl, "toks", k = K,
        queryCount = 5, targetRecall = target, maxWiden = 8,
        predicate = Some(col("mdoc") % 3 === 1))
      val filteredOk = filtered.steps.size == 1 && !filtered.updated &&
        filtered.picked == r.picked &&
        filtered.steps.head.recall >= target
      if (sweepOk && filteredOk) Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally AnnCatalog.unregister(s, tbl)
  }

  def all: Seq[QueryDef] = Seq(
    QueryDef("multivec_maxsim", Some(maxsimOracle), maxsimFlat),
    QueryDef("multivec_maxsim_doc", Some(maxsimOracle), maxsimDoc),
    QueryDef("multivec_maxsim_cos", Some(maxsimCosOracle), maxsimCos),
    QueryDef("multivec_plaid_recall", Some("SELECT 1 AS ok"), plaidRecall),
    QueryDef("multivec_plaid_pruned", Some("SELECT 1 AS ok"), plaidPruned),
    QueryDef("streaming_multivec_insert", Some(maxsimOracle),
      streamingMultivecInsert),
    QueryDef("multivec_consolidate", Some(consolidateOracle),
      multivecConsolidate),
    QueryDef("autotune_multivec", Some("SELECT 1 AS ok"),
      multivecAutotune),
    QueryDef("knn_maxsim_planner", Some("SELECT 1 AS ok"), maxsimPlanner),
    QueryDef("knn_join_maxsim_planner", Some("SELECT 1 AS ok"),
      maxsimJoinPlanner),
    QueryDef("knn_maxsim_filtered_planner", Some("SELECT 1 AS ok"),
      maxsimFilteredPlanner),
    QueryDef("retune_multivec", Some("SELECT 1 AS ok"),
      retuneMultivecGate))
}
