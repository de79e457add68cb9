package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.sparse_dot
import graft.ops.SparseSearch

/** Driver-checkable queries for the learned-sparse retrieval surface
  * ([[graft.ops.SparseSearch]] — SPLADE-style impact vectors, the
  * sparse sibling of the §2.1 dense-distance gates).
  *
  * Both gates sparsify the embeddings table by ReLU threshold
  * `tau = 0.125` (exactly representable in binary, so the engine's
  * float comparison and the oracle's double comparison agree
  * bit-for-bit), score against the sparsified `vec_id = 0` row, and
  * cut the top-10 on the ROUNDED score over the complete scored set
  * (the same no-raw-pool-boundary protocol as the bm25/hybrid gates).
  * The two gates share one oracle: exact and inverted paths must
  * produce identical rows.
  */
object SparseQueries {

  private val Tau = 0.125f

  private def scoredExact(s: SparkSession, dir: String): DataFrame =
    scoredArm(Tables.embeddings(s, dir)).limit(10)

  /** The sparsified query row's (indices, values), driver-side. */
  private def queryArrays(e: DataFrame): (Seq[Int], Seq[Float]) = {
    val qRow = e.where(col("vec_id") === 0)
      .select(SparseSearch.sparsify(col("embedding"), Tau).as("qv"))
      .head().getStruct(0)
    (qRow.getSeq[Int](0), qRow.getSeq[Float](1))
  }

  private def sparseDocs(e: DataFrame): DataFrame =
    e.where(col("vec_id") =!= 0)
      .select(col("vec_id"), SparseSearch.sparsify(col("embedding"), Tau).as("sv"))

  /** Top-10 cut on the rounded score over the COMPLETE scored set —
    * `k` above any test sf's matched-doc count (hybrid_rrf protocol). */
  private def invertedCut(post: DataFrame, qIdx: Seq[Int], qVal: Seq[Float]): DataFrame =
    SparseSearch.invertedTopK(post, "vec_id", qIdx, qVal, k = 1000000)
      .withColumn("score", round(col("score"), 4))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10)
      .select("vec_id", "score")

  private def scoredInverted(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val (qIdx, qVal) = queryArrays(e)
    invertedCut(SparseSearch.postings(sparseDocs(e), "vec_id", col("sv")), qIdx, qVal)
  }

  /** Third physical path, same oracle: postings materialized
    * hash-bucketed by term (bounded directory fan-out), the query read
    * PRUNED to its own terms' buckets — the on-disk inverted-file
    * shape for 100 TB. */
  private def scoredPruned(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val (qIdx, qVal) = queryArrays(e)
    val path = AnnQueries.artifactDir("sparsepostb", dir, "embeddings")
    AnnQueries.cached(path) {
      SparseSearch.writePostings(
        SparseSearch.postings(sparseDocs(e), "vec_id", col("sv")), path)
    }
    invertedCut(SparseSearch.readPostings(s, path, qIdx), qIdx, qVal)
  }

  /** Shared oracle: the thresholded masked dot replayed densely in SQL.
    * Matched products accumulate in ascending-index order on both sides
    * (the zero CASE terms don't perturb a double sum), so the unrounded
    * scores are bit-identical and the rounded cut is exact. */
  private val sparseOracle: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |sc AS (
      |  SELECT e.vec_id,
      |    list_sum(list_transform(list_zip(e.embedding, q.qv),
      |      p -> CASE WHEN CAST(p[1] AS DOUBLE) >= 0.125
      |                 AND CAST(p[2] AS DOUBLE) >= 0.125
      |        THEN CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
      |        ELSE 0.0 END)) AS s
      |  FROM embeddings e, q
      |  WHERE e.vec_id <> 0)
      |SELECT vec_id, round(s, 4) AS score
      |FROM sc WHERE s > 0
      |ORDER BY score DESC, vec_id
      |LIMIT 10""".stripMargin

  /** Streaming twin: the inverted file maintained INCREMENTALLY — base
    * postings written once, the remaining docs arriving as file-source
    * micro-batches whose postings APPEND into the term directories
    * ([[graft.ops.SparseSearch.appendPostings]], the `aminsert` analog).
    * Because the per-doc fold is term-ordered (file-order-independent),
    * the streamed table must score BIT-IDENTICALLY to a from-scratch
    * build — so this gate hash-matches the same full-SQL oracle as the
    * batch paths, a stronger check than the recall-style streaming
    * gates, with a doc-count fail-fast against silently dropped
    * batches. */
  private def streamingSparseInsert(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val docs = e.where(col("vec_id") =!= 0)
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ssp").toString + "/post"
    // the fail-fast corpus count and the query row never touch the
    // postings table — overlap them with the build + stream chain
    val nKeptF = RecallProtocol.async(sparseDocs(docs)
      .where(size(col("sv.indices")) > 0).count())
    val qArrF = RecallProtocol.async(queryArrays(e))
    SparseSearch.writePostings(
      SparseSearch.postings(sparseDocs(e.where(col("vec_id") <= maxId / 2)),
        "vec_id", col("sv")), path)
    val rest = docs.where(col("vec_id") > maxId / 2)
      .select(col("vec_id"), col("embedding"))
    val lo = maxId / 2 + 1
    val width = (maxId - lo) / 3 + 1
    val chunkRoot = AnnQueries.artifactDir("sspins", dir, "embeddings")
    val files = StreamChunks.materialize(chunkRoot,
      (0 until 3).map { c => () =>
        rest.where(col("vec_id") >= lo + c * width &&
          col("vec_id") < lo + (c + 1) * width)
      })
    val (streamDir, src) = StreamChunks.source(s, rest.schema)
    val q = src.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) SparseSearch.appendPostings(
          SparseSearch.postings(sparseDocs(b), "vec_id", col("sv")), path)
      }
      .start()
    StreamChunks.drive(q, streamDir, files)

    val streamed = s.read.parquet(path)
    val nDocs = streamed.select("vec_id").distinct().count()
    if (nDocs != nKeptF()) {
      // a dropped micro-batch must fail the hash compare loudly;
      // drain the still-running query fetch so it cannot bleed into
      // the next gate's timing (its own failure must not mask this)
      try qArrF() catch { case _: Throwable => () }
      import s.implicits._
      Seq.empty[(Long, Double)].toDF("vec_id", "score")
    } else {
      val (qIdx, qVal) = qArrF()
      invertedCut(SparseSearch.readPostings(s, path, qIdx), qIdx, qVal)
    }
  }

  /** Lifecycle gate — the full maintenance chain in one pass
    * ([[graft.ops.SparseSearch.deletePostings]] /
    * [[graft.ops.SparseSearch.consolidatePostings]], the
    * `ambulkdelete` + `consolidate_bm25_table` analogs): build the
    * inverted file over the first half of the corpus, APPEND the
    * second half, DELETE docs 1–3 (tombstones — masked by every read),
    * CONSOLIDATE (compaction + physical delete + tombstone retirement),
    * then the pruned-read score must hash-match the oracle over the
    * corpus MINUS the deleted docs — with structural fail-fasts that
    * compaction actually landed (exactly one file per bucket
    * directory, tombstone dir gone). */
  private val Deleted = Seq(1L, 2L, 3L)

  private def sparseConsolidate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    // the query row never touches the postings — overlap its fetch
    // with the build/append/delete/consolidate chain
    val qArrF = RecallProtocol.async(queryArrays(e))
    val docs = sparseDocs(e)
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-scons").toString + "/post"
    SparseSearch.writePostings(
      SparseSearch.postings(docs.where(col("vec_id") <= maxId / 2),
        "vec_id", col("sv")), path, buckets = 16)
    SparseSearch.appendPostings(
      SparseSearch.postings(docs.where(col("vec_id") > maxId / 2),
        "vec_id", col("sv")), path)
    SparseSearch.deletePostings(s, path, Deleted)
    SparseSearch.consolidatePostings(s, path)

    // post-consolidate the data serves from the committed generation
    // dir; the structural check must look at what SERVES
    val served = new java.net.URI(SparseSearch.dataDir(s, path)).getPath
    val bucketDirs = new java.io.File(served).listFiles()
      .filter(_.getName.startsWith("tb="))
    val compacted = bucketDirs.nonEmpty && bucketDirs.forall(
      _.listFiles().count(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith(".")) == 1)
    val tombGone = !new java.io.File(s"$path/_tombstones").exists()
    if (!compacted || !tombGone) {
      try qArrF() catch { case _: Throwable => () } // drain the overlap
      Seq.empty[(Long, Double)].toDF("vec_id", "score")
    } else {
      val (qIdx, qVal) = qArrF()
      invertedCut(SparseSearch.readPostings(s, path, qIdx), qIdx, qVal)
    }
  }

  private val sparseConsolidateOracle: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |sc AS (
      |  SELECT e.vec_id,
      |    list_sum(list_transform(list_zip(e.embedding, q.qv),
      |      p -> CASE WHEN CAST(p[1] AS DOUBLE) >= 0.125
      |                 AND CAST(p[2] AS DOUBLE) >= 0.125
      |        THEN CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
      |        ELSE 0.0 END)) AS s
      |  FROM embeddings e, q
      |  WHERE e.vec_id <> 0 AND e.vec_id NOT IN (1, 2, 3))
      |SELECT vec_id, round(s, 4) AS score
      |FROM sc WHERE s > 0
      |ORDER BY score DESC, vec_id
      |LIMIT 10""".stripMargin

  /** Sparse PLANNER gate — the scalar ORDER-BY form: a materialized
    * sparse table registered `kind = "sparse"` answers
    * `orderBy(sparse_dot(sv, Q).desc, id).limit(k)` through
    * bucket-pruned inverted candidates + exact join-back rescore
    * ([[graft.plans.SparseAnnIdsLogical]]). Because the inverted fold
    * is bit-identical to the row-wise merge, the bar is FULL
    * bit-equality to the exact plan, not recall: the gate hash-matches
    * a raw-order oracle cut (the plan's own boundary — raw score desc,
    * id tiebreak — then rounded for display). A plan assertion fails
    * the gate loudly if the rewrite didn't fire. */
  private def sparsePlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.AnnCatalog
    val e = Tables.embeddings(s, dir)
    val (qIdx, qVal) = queryArrays(e)
    val docsPath = AnnQueries.artifactDir("sdocs", dir, "embeddings")
    AnnQueries.cached(docsPath) {
      sparseDocs(e).write.mode("overwrite").parquet(s"$docsPath/docs")
    }
    val postPath = AnnQueries.artifactDir("sparsepostb", dir, "embeddings")
    AnnQueries.cached(postPath) {
      SparseSearch.writePostings(
        SparseSearch.postings(sparseDocs(e), "vec_id", col("sv")), postPath)
    }
    val tablePath = s"$docsPath/docs"
    AnnCatalog.register(s, tablePath, AnnCatalog.IndexMeta(
      postPath, "vec_id", "sv", "sparsedot", ef = 64, kind = "sparse"))
    try {
      val docs = s.read.parquet(tablePath)
      val q = SparseSearch.queryLit(qIdx, qVal)
      val top = docs
        .orderBy(sparse_dot(col("sv"), q).desc, col("vec_id"))
        .limit(10)
      if (!top.queryExecution.optimizedPlan.toString.contains("SparseAnnIds"))
        Seq.empty[(Long, Double)].toDF("vec_id", "score")
      else top.select(col("vec_id"),
        round(sparse_dot(col("sv"), q), 4).as("score"))
    } finally AnnCatalog.unregister(s, tablePath)
  }

  /** FILTERED sparse planner gate: `WHERE pred ORDER BY sparse_dot
    * DESC, id LIMIT k` over the same registration must still rewrite
    * ([[graft.plans.SparseAnnIdsLogical]] with the captured predicate)
    * — and because the survivor semi-join runs BEFORE the inverted
    * fold, the filtered form is exact like the scalar one: the bar is
    * full hash-equality to the filtered SQL replay. */
  private def sparseFilteredPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.AnnCatalog
    val e = Tables.embeddings(s, dir)
    val (qIdx, qVal) = queryArrays(e)
    val docsPath = AnnQueries.artifactDir("sdocs", dir, "embeddings")
    AnnQueries.cached(docsPath) {
      sparseDocs(e).write.mode("overwrite").parquet(s"$docsPath/docs")
    }
    val postPath = AnnQueries.artifactDir("sparsepostb", dir, "embeddings")
    AnnQueries.cached(postPath) {
      SparseSearch.writePostings(
        SparseSearch.postings(sparseDocs(e), "vec_id", col("sv")), postPath)
    }
    val tablePath = s"$docsPath/docs"
    AnnCatalog.register(s, tablePath, AnnCatalog.IndexMeta(
      postPath, "vec_id", "sv", "sparsedot", ef = 64, kind = "sparse"))
    try {
      val docs = s.read.parquet(tablePath)
      val q = SparseSearch.queryLit(qIdx, qVal)
      val top = docs
        .where(col("vec_id") % 3 === 1)
        .orderBy(sparse_dot(col("sv"), q).desc, col("vec_id"))
        .limit(10)
      val fired = top.queryExecution.optimizedPlan.collect {
        case m: graft.plans.SparseAnnIdsLogical if m.pred.isDefined => m
      }.nonEmpty
      if (!fired) Seq.empty[(Long, Double)].toDF("vec_id", "score")
      else top.select(col("vec_id"),
        round(sparse_dot(col("sv"), q), 4).as("score"))
    } finally AnnCatalog.unregister(s, tablePath)
  }

  private val sparseFilteredPlannerOracle: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |sc AS (
      |  SELECT e.vec_id,
      |    list_sum(list_transform(list_zip(e.embedding, q.qv),
      |      p -> CASE WHEN CAST(p[1] AS DOUBLE) >= 0.125
      |                 AND CAST(p[2] AS DOUBLE) >= 0.125
      |        THEN CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
      |        ELSE 0.0 END)) AS s
      |  FROM embeddings e, q
      |  WHERE e.vec_id <> 0 AND e.vec_id % 3 = 1)
      |SELECT vec_id, round(s, 4) AS score
      |FROM sc
      |ORDER BY s DESC, vec_id
      |LIMIT 10""".stripMargin

  /** Raw-order oracle for the planner gate: the cut happens on the RAW
    * double (the exact plan's own sort boundary), the output rounds. */
  private val sparsePlannerOracle: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |sc AS (
      |  SELECT e.vec_id,
      |    list_sum(list_transform(list_zip(e.embedding, q.qv),
      |      p -> CASE WHEN CAST(p[1] AS DOUBLE) >= 0.125
      |                 AND CAST(p[2] AS DOUBLE) >= 0.125
      |        THEN CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
      |        ELSE 0.0 END)) AS s
      |  FROM embeddings e, q
      |  WHERE e.vec_id <> 0)
      |SELECT vec_id, round(s, 4) AS score
      |FROM sc
      |ORDER BY s DESC, vec_id
      |LIMIT 10""".stripMargin

  /** Batched multi-query gate ([[graft.ops.SparseSearch.searchMany]]
    * — the searchMany contract for the sparse family): THREE query
    * docs ride one pruned postings pass, and every (query, doc, score,
    * rank) row must hash-match a full per-query SQL replay — exact,
    * not recall-style, because the batched fold is term-ordered like
    * the single-query path. The rank window cuts on the RAW score
    * (id tiebreak), the output rounds. */
  private val ManyQueries = 3

  private def sparseMany(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val docs = sparseDocs(e.where(col("vec_id") >= ManyQueries))
    val qs = e.where(col("vec_id") < ManyQueries)
      .select(col("vec_id"), SparseSearch.sparsify(col("embedding"), Tau).as("qv"))
      .collect()
      .map { r =>
        val st = r.getStruct(1)
        (r.getLong(0), st.getSeq[Int](0), st.getSeq[Float](1))
      }.toSeq.sortBy(_._1)
    val path = java.nio.file.Files
      .createTempDirectory("graft-smany").toString + "/post"
    SparseSearch.writePostings(
      SparseSearch.postings(docs, "vec_id", col("sv")), path, buckets = 16)
    SparseSearch.searchManyOnDisk(s, path, qs, k = 10)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 4).as("score"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val sparseManyOracle: String =
    s"""WITH q AS (
      |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
      |  WHERE vec_id < $ManyQueries),
      |sc AS (
      |  SELECT q.qid, e.vec_id,
      |    list_sum(list_transform(list_zip(e.embedding, q.qv),
      |      p -> CASE WHEN CAST(p[1] AS DOUBLE) >= 0.125
      |                 AND CAST(p[2] AS DOUBLE) >= 0.125
      |        THEN CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
      |        ELSE 0.0 END)) AS s
      |  FROM embeddings e, q
      |  WHERE e.vec_id >= $ManyQueries),
      |r AS (
      |  SELECT qid, vec_id, s,
      |    row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id)
      |      AS rank
      |  FROM sc WHERE s > 0)
      |SELECT qid AS query_id, vec_id AS neighbor_id,
      |  round(s, 4) AS score, rank
      |FROM r WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Sparse LATERAL planner gate: `FROM probes p, LATERAL (SELECT id
    * FROM docs ORDER BY sparse_dot(sv, p.qsv) DESC LIMIT k)` — which
    * vanilla Spark rejects at analysis — must rewrite through
    * [[graft.plans.AnnKnnJoinLogical]] with `kind = "sparse"` (every
    * probe batched through ONE pruned inverted-file pass), and because
    * the batched fold is exact, the bar is FULL hash-equality to the
    * per-query SQL replay, not recall. */
  private def sparseJoinPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.AnnCatalog
    val e = Tables.embeddings(s, dir)
    val docsPath = AnnQueries.artifactDir("sdocs", dir, "embeddings")
    AnnQueries.cached(docsPath) {
      sparseDocs(e).write.mode("overwrite").parquet(s"$docsPath/docs")
    }
    val postPath = AnnQueries.artifactDir("sparsepostb", dir, "embeddings")
    AnnQueries.cached(postPath) {
      SparseSearch.writePostings(
        SparseSearch.postings(sparseDocs(e), "vec_id", col("sv")), postPath)
    }
    val tablePath = s"$docsPath/docs"
    AnnCatalog.register(s, tablePath, AnnCatalog.IndexMeta(
      postPath, "vec_id", "sv", "sparsedot", ef = 64, kind = "sparse"))
    val probesView = "graft_sjp_probes"
    val docsView = "graft_sjp_docs"
    try {
      e.where(col("vec_id") < ManyQueries)
        .select(col("vec_id").as("q_id"),
          SparseSearch.sparsify(col("embedding"), Tau).as("qsv"))
        .createOrReplaceTempView(probesView)
      s.read.parquet(tablePath).createOrReplaceTempView(docsView)
      val qdf = s.sql(
        s"""SELECT p.q_id AS query_id, t.vec_id AS neighbor_id
           |FROM $probesView p,
           |LATERAL (
           |  SELECT vec_id FROM $docsView
           |  ORDER BY sparse_dot(sv, p.qsv) DESC LIMIT 10
           |) t""".stripMargin)
      val planned = qdf.queryExecution.optimizedPlan.collect {
        case a: graft.plans.AnnKnnJoinLogical if a.kind == "sparse" => a
      }.nonEmpty
      if (!planned) Seq.empty[(Long, Long)].toDF("query_id", "neighbor_id")
      else qdf.orderBy(col("query_id"), col("neighbor_id"))
    } finally {
      AnnCatalog.unregister(s, tablePath)
      s.catalog.dropTempView(probesView)
      s.catalog.dropTempView(docsView)
      ()
    }
  }

  /** Per-query replay of the lateral's exact semantics: top-10 per
    * probe by (raw score desc, id), rows ordered (query_id, id). */
  private val sparseJoinPlannerOracle: String =
    s"""WITH q AS (
      |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
      |  WHERE vec_id < $ManyQueries),
      |sc AS (
      |  SELECT q.qid, e.vec_id,
      |    list_sum(list_transform(list_zip(e.embedding, q.qv),
      |      p -> CASE WHEN CAST(p[1] AS DOUBLE) >= 0.125
      |                 AND CAST(p[2] AS DOUBLE) >= 0.125
      |        THEN CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
      |        ELSE 0.0 END)) AS s
      |  FROM embeddings e, q
      |  WHERE e.vec_id <> 0),
      |r AS (
      |  SELECT qid, vec_id,
      |    row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id)
      |      AS rank
      |  FROM sc WHERE s > 0)
      |SELECT qid AS query_id, vec_id AS neighbor_id
      |FROM r WHERE rank <= 10
      |ORDER BY query_id, neighbor_id""".stripMargin

  /** Sparse + dense RRF hybrid: the SPLADE-era production combiner
    * (sparse impact top-20 fused with dense l2sq top-20 by reciprocal
    * rank — [[graft.ops.HybridSearch]]); both arms cut on rounded
    * scores over their complete scored sets, ranks fuse over ≤40 rows. */
  private def hybridSparseDense(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.HybridSearch
    val e = Tables.embeddings(s, dir)
    val sparseTop = scoredArm(e).limit(20)
    val sparseRanked = HybridSearch.ranked(
      sparseTop, "vec_id", Seq(col("score").desc, col("vec_id")))
    val qDense = e.where(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val denseTop = e.where(col("vec_id") =!= 0)
      .select(col("vec_id"),
        round(graft.functions.l2sq_dist(col("embedding"), lit(qDense)), 4).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(20)
    val denseRanked = HybridSearch.ranked(
      denseTop, "vec_id", Seq(col("d"), col("vec_id")))
    HybridSearch.rrf(Seq(sparseRanked, denseRanked), n = 10)
      .select(col("id"),
        (floor(col("rrf_score") * 1e6 + 0.5) / 1e6).as("rrf"))
  }

  /** The complete (vec_id, rounded score) sparse arm, descending. */
  private def scoredArm(e: DataFrame): DataFrame = {
    val q = broadcast(e.where(col("vec_id") === 0)
      .select(SparseSearch.sparsify(col("embedding"), Tau).as("qv")))
    e.where(col("vec_id") =!= 0)
      .select(col("vec_id"), SparseSearch.sparsify(col("embedding"), Tau).as("sv"))
      .crossJoin(q)
      .withColumn("s", sparse_dot(col("sv"), col("qv")))
      .where(col("s") > 0)
      .withColumn("score", round(col("s"), 4))
      .orderBy(col("score").desc, col("vec_id"))
      .select("vec_id", "score")
  }

  private val hybridSparseDenseOracle: String = {
    val l2 =
      "list_sum(list_transform(list_zip(e.embedding, qr.q2), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))^2))"
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |sc AS (
       |  SELECT e.vec_id,
       |    list_sum(list_transform(list_zip(e.embedding, q.qv),
       |      p -> CASE WHEN CAST(p[1] AS DOUBLE) >= 0.125
       |                 AND CAST(p[2] AS DOUBLE) >= 0.125
       |        THEN CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
       |        ELSE 0.0 END)) AS s
       |  FROM embeddings e, q
       |  WHERE e.vec_id <> 0),
       |sp AS (
       |  SELECT vec_id, round(s, 4) AS score FROM sc WHERE s > 0
       |  ORDER BY score DESC, vec_id LIMIT 20),
       |spr AS (
       |  SELECT vec_id AS id,
       |    row_number() OVER (ORDER BY score DESC, vec_id) AS rank
       |  FROM sp),
       |vec AS (
       |  SELECT e.vec_id, round($l2, 4) AS d
       |  FROM embeddings e,
       |    (SELECT embedding AS q2 FROM embeddings WHERE vec_id = 0) qr
       |  WHERE e.vec_id <> 0
       |  ORDER BY d, e.vec_id LIMIT 20),
       |vr AS (
       |  SELECT vec_id AS id,
       |    row_number() OVER (ORDER BY d, vec_id) AS rank
       |  FROM vec),
       |u AS (
       |  SELECT id, 1.0 / (60.0 + rank) AS c FROM spr
       |  UNION ALL
       |  SELECT id, 1.0 / (60.0 + rank) AS c FROM vr)
       |SELECT id, floor(sum(c) * 1e6 + 0.5) / 1e6 AS rrf
       |FROM u GROUP BY id
       |ORDER BY sum(c) DESC, id LIMIT 10""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("sparse_knn_exact", Some(sparseOracle), scoredExact),
    QueryDef("sparse_knn_inverted", Some(sparseOracle), scoredInverted),
    QueryDef("sparse_knn_pruned", Some(sparseOracle), scoredPruned),
    QueryDef("streaming_sparse_insert", Some(sparseOracle), streamingSparseInsert),
    QueryDef("sparse_consolidate", Some(sparseConsolidateOracle), sparseConsolidate),
    QueryDef("knn_sparse_planner", Some(sparsePlannerOracle), sparsePlanner),
    QueryDef("sparse_knn_many", Some(sparseManyOracle), sparseMany),
    QueryDef("knn_join_sparse_planner", Some(sparseJoinPlannerOracle),
      sparseJoinPlanner),
    QueryDef("knn_sparse_filtered_planner", Some(sparseFilteredPlannerOracle),
      sparseFilteredPlanner),
    QueryDef("hybrid_sparse_dense", Some(hybridSparseDenseOracle), hybridSparseDense),
  )
}
