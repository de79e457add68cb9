package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShim

import graft.functions.{MatVecProject, MaxSimScore, NearestCentroid}

/** Late-interaction multi-vector retrieval — ColBERT MaxSim scoring
  * with a PLAID-style centroid-pruned scale path (Khattab & Zaharia
  * SIGIR 2020; Santhanam et al., "PLAID: An Efficient Engine for Late
  * Interaction Retrieval", CIKM 2022). The multi-vector sibling of the
  * engine's dense-kNN and learned-sparse surfaces: a document is a SET
  * of token vectors, relevance is the sum over query tokens of the
  * best-matching document token's dot product.
  *
  * Three physical shapes, deterministically consistent:
  *
  *  - [[scoreFlat]] — the token-table form: one codegen'd
  *    [[MatVecProject]] per token row computes ALL query-token dots at
  *    once, then two partial-aggregated shuffles (max per (doc, query
  *    token), ordered sum per doc) produce every (doc, query) score.
  *    This is the 100 TB shape: tokens are never grouped into per-doc
  *    arrays, the shuffle carries |docs|·|query tokens| partial-maxed
  *    rows, and any number of queries batch through ONE corpus pass.
  *  - [[scoreDocs]] — the per-document form: token arrays scored by
  *    one codegen'd [[MaxSimScore]] pass, `TakeOrderedAndProject`
  *    reduction. The rerank kernel: no shuffle at all when the doc
  *    arrays are already materialized.
  *  - [[plaidSearch]] / the [[writeTokenPostings]] on-disk variant —
  *    PLAID's two-stage pruning: every token is assigned its nearest
  *    coarse centroid (map-side codegen'd argmin, an IVF over TOKENS
  *    rather than documents); a query probes its tokens' `nprobe`
  *    nearest centroids, approximates every probed doc's MaxSim from
  *    the probed tokens' SCALAR-QUANTIZED i8 codes (1 byte/dim — the
  *    compressed-residual stage; float vectors are never read in
  *    stage 1), cuts the top `candPerQuery` docs per query, and
  *    reranks just those exactly. On disk the assignment is
  *    materialized `partitionBy(cent)`, so stage 1 prunes at
  *    file-listing time to the probed centroids' directories and at
  *    column level to `(mdoc, tok_i8)` — I/O proportional to the
  *    probed lists at a quarter of the vector bytes, not the corpus.
  *
  * Determinism contract: per-token dots accumulate sequentially in
  * double ascending the vector (MatVecProject's loop = the oracle's
  * `list_sum(list_transform(list_zip(...)))`), `max` is
  * order-independent, and the per-doc sum folds in ascending
  * query-token order on every path — scores are bit-identical across
  * the three shapes and to the DuckDB replay.
  */
object MultiVec {

  /** Derive the token table `(mdoc, t_idx, tok)` from a flat vector
    * table by grouping `toksPerDoc` consecutive ids into one document
    * (the deterministic multi-vector fixture over a single-vector
    * corpus; ids must be non-negative). `normalize = true` unit-norms
    * every token (codegen'd [[graft.functions.UnitNormalize]]), making
    * the MaxSim dot a cosine — ColBERT's own convention (the encoder
    * L2-normalizes token embeddings, Khattab & Zaharia SIGIR 2020 §3.1). */
  def tokens(e: DataFrame, idCol: String, vecCol: String,
      toksPerDoc: Int, normalize: Boolean = false): DataFrame = {
    require(toksPerDoc >= 1, s"graft: toksPerDoc must be >= 1, got $toksPerDoc")
    val tok =
      if (normalize) GraftSqlShim.column(graft.functions.UnitNormalize(
        GraftSqlShim.expression(col(vecCol))))
      else col(vecCol)
    e.select(
      expr(s"$idCol div $toksPerDoc").as("mdoc"),
      (col(idCol) % toksPerDoc).cast("int").as("t_idx"),
      tok.as("tok"))
  }

  /** Driver-side query token rows `(q_mdoc, q_t, vec)` for a set of
    * query documents, ordered by (q_mdoc, q_t) — the stacking order of
    * the flat path's projection matrix and the fold order of every
    * score. */
  def queryToks(toks: DataFrame, qDocs: Seq[Long]): Array[(Long, Int, Array[Float])] = {
    require(qDocs.nonEmpty, "graft: queryToks needs at least one query doc")
    val out = toks.where(col("mdoc").isin(qDocs: _*))
      .orderBy(col("mdoc"), col("t_idx"))
      .select(col("mdoc"), col("t_idx"), col("tok"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val missing = qDocs.toSet -- out.iterator.map(_._1).toSet
    require(missing.isEmpty,
      s"graft: query docs not found in the token table: " +
        missing.toSeq.sorted.mkString(", "))
    out
  }

  /** Shared MaxSim fold: from per-token query-dot arrays
    * `(mdoc, __qdots [, extra carried cols])` to `(mdoc, q_mdoc,
    * score)` — `posexplode`, partial-aggregated max per (doc, query
    * token), ordered sum per (doc, query). `mask` (optional) filters
    * the exploded rows BEFORE the max — the probed-centroid
    * restriction of the approximate stage. */
  private def foldQDots(dots: DataFrame,
      qToks: Array[(Long, Int, Array[Float])],
      mask: DataFrame => DataFrame = identity): DataFrame = {
    val qDocIds = qToks.map(_._1)
    val qTIdx = qToks.map(_._2)
    val carried = dots.columns.filter(c => c != "mdoc" && c != "__qdots")
      .map(col).toSeq
    mask(dots
      .select((col("mdoc") +: posexplode(col("__qdots")).as(Seq("__r", "__dot")) +:
        carried): _*)
      .select((col("mdoc") +:
        element_at(typedlit(qDocIds), col("__r") + 1).as("q_mdoc") +:
        element_at(typedlit(qTIdx), col("__r") + 1).as("__qt") +:
        col("__dot") +: carried): _*))
      .groupBy(col("mdoc"), col("q_mdoc"), col("__qt"))
      .agg(max(col("__dot")).as("__m"))
      .groupBy(col("mdoc"), col("q_mdoc"))
      .agg(collect_list(struct(col("__qt"), col("__m"))).as("__ms"))
      .select(col("mdoc"), col("q_mdoc"),
        aggregate(array_sort(col("__ms")), lit(0.0d),
          (acc, x) => acc + x.getField("__m")).as("score"))
  }

  /** All (document, query) MaxSim scores in ONE corpus pass: the
    * stacked query matrix rides a single [[MatVecProject]] (array of
    * every query token's dot per token row), `posexplode` +
    * partial-aggregated max per (doc, query token), then an ordered
    * fold per (doc, query). Output: `(mdoc, q_mdoc, score: double)`.
    */
  def scoreFlat(docToks: DataFrame,
      qToks: Array[(Long, Int, Array[Float])]): DataFrame = {
    require(qToks.nonEmpty, "graft: scoreFlat needs query tokens")
    val matrix = qToks.map(_._3.map(_.toDouble))
    foldQDots(
      docToks.select(col("mdoc"),
        GraftSqlShim.column(MatVecProject(
          GraftSqlShim.expression(col("tok")), matrix)).as("__qdots")),
      qToks)
  }

  /** Group a token table into per-document ordered token arrays
    * `(mdoc, toks: array<array<float>>)` — the rerank-side layout. */
  def docArrays(docToks: DataFrame): DataFrame =
    docToks
      .groupBy(col("mdoc"))
      .agg(collect_list(struct(col("t_idx"), col("tok"))).as("__ts"))
      .select(col("mdoc"),
        transform(array_sort(col("__ts")), t => t.getField("tok")).as("toks"))

  /** MaxSim scoring column over a doc-array column for a query token
    * matrix — also the sort expression the planner form matches:
    * `docs.orderBy(maxsimCol(col("toks"), Q).desc).limit(k)` over a
    * table registered with `kind = "multivec"` rewrites to PLAID
    * stage-1 candidates + exact join-back rescore. */
  def maxsimCol(toksCol: Column, qMatrix: Array[Array[Float]]): Column =
    GraftSqlShim.column(MaxSimScore(
      GraftSqlShim.expression(toksCol), qMatrix.map(_.map(_.toDouble))))

  /** MaxSim score column over a doc-array table for ONE query doc's
    * token matrix — one codegen'd pass, no shuffle. */
  def scoreDocs(docs: DataFrame, qMatrix: Array[Array[Float]]): DataFrame =
    docs.select(col("mdoc"), maxsimCol(col("toks"), qMatrix).as("score"))

  /** Exact MaxSim top-k for EVERY query in one corpus pass — the
    * maxsim counterpart of [[VectorSearch.knnJoinExact]]: broadcast
    * the (small) query token matrices, stream the doc-array table
    * once, score each (doc, query) pair with the codegen'd two-column
    * [[graft.functions.MaxSimScoreCol]] (bit-identical to every other
    * maxsim path), window top-k per query. Ties break on ascending doc
    * id, matching the serving sort `orderBy(score.desc, idCol)`.
    * Output: `(query_id, neighbor_id, score)`. */
  def maxsimJoinExact(docs: DataFrame, idCol: String, toksCol: String,
      queries: Seq[(Long, Array[Array[Float]])], k: Int): DataFrame = {
    require(queries.nonEmpty, "graft: maxsimJoinExact needs queries")
    val spark = docs.sparkSession
    import spark.implicits._
    val qdf = broadcast(
      queries.map { case (qid, m) => (qid, m.map(_.toSeq).toSeq) }
        .toDF("query_id", "__qtoks"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    docs
      .select(col(idCol).cast("long").as("neighbor_id"),
        col(toksCol).as("__dtoks"))
      .crossJoin(qdf)
      .withColumn("score", GraftSqlShim.column(
        graft.functions.MaxSimScoreCol(
          GraftSqlShim.expression(col("__dtoks")),
          GraftSqlShim.expression(col("__qtoks")))))
      .withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"))
  }

  /** Coarse token centroids: deterministic hash-sample + seeded
    * k-means++ over ALL documents' token vectors (queries included —
    * assignment must see the same space the probes are computed in). */
  def trainCentroids(toks: DataFrame, k: Int, sampleLimit: Int = 16384,
      seed: Long = 42L): Array[Array[Float]] = {
    val sample = graft.util.Sampling
      .hashSample(toks.select(col("tok")), sampleLimit, col("tok"))
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "graft: empty sample for token centroids")
    graft.pq.ProductQuantizer.kmeansLocalPublic(
      sample, math.min(k, sample.length), maxIter = 20, tol = 0.1, seed = seed)
  }

  /** Token table + map-side codegen'd nearest-centroid assignment and
    * the stage-1 compressed code column (`cent: int`,
    * `tok_i8: array<tinyint>`) — one projection, no shuffle. */
  def assign(docToks: DataFrame, centroids: Array[Array[Float]]): DataFrame =
    docToks
      .withColumn("cent",
        GraftSqlShim.column(NearestCentroid(
          GraftSqlShim.expression(col("tok")), centroids)))
      .withColumn("tok_i8",
        GraftSqlShim.column(graft.functions.QuantizeI8Expr(
          GraftSqlShim.expression(col("tok")), I8Lo, I8Hi)))

  /** Per-query-doc probed centroid set: each query token probes its
    * `nprobe` nearest centroids (l2; driver math over k×dim floats),
    * the query doc's set is the union. */
  def probeSets(qToks: Array[(Long, Int, Array[Float])],
      centroids: Array[Array[Float]], nprobe: Int): Map[Long, Set[Int]] = {
    require(nprobe >= 1, s"graft: nprobe must be >= 1, got $nprobe")
    def nearest(v: Array[Float]): Seq[Int] =
      centroids.zipWithIndex.map { case (c, i) =>
        var s = 0.0; var j = 0
        while (j < v.length) { val x = v(j) - c(j); s += x * x; j += 1 }
        (s, i)
      }.sortBy(p => (p._1, p._2)).take(math.min(nprobe, centroids.length))
        .map(_._2).toSeq
    qToks.groupBy(_._1).view
      .mapValues(_.flatMap(t => nearest(t._3)).toSet).toMap
  }

  /** Tiny (q_mdoc, cent) probe table from [[probeSets]]'s driver map. */
  private def probeDf(s: SparkSession, probes: Map[Long, Set[Int]]): DataFrame = {
    import s.implicits._
    probes.toSeq
      .flatMap { case (q, cs) => cs.toSeq.sorted.map(c => (q, c)) }
      .toDF("q_mdoc", "cent")
  }

  /** The i8 quantization range of the compressed stage-1 codes:
    * ±0.625 brackets typical embedding coordinates with an exactly
    * representable power-of-two fraction (finer steps than ±1 at the
    * same byte cost; out-of-range coordinates clamp). */
  val I8Lo: Float = -0.625f
  val I8Hi: Float = 0.625f

  /** PLAID stage 1 — compressed approximate scores: probed tokens are
    * scored from their SCALAR-QUANTIZED i8 codes (1 byte/dim — the
    * ColBERTv2/PLAID compressed-residual stage, Santhanam et al. CIKM
    * 2022 §4), never the float vectors, so the stage-1 scan reads a
    * quarter of the vector bytes and (on disk) prunes to the probed
    * centroids' partitions. A token contributes to a query's
    * approximation only when its centroid is in that query's probed
    * set (the broadcast mask) — PLAID's probed-list semantics. Output:
    * `(mdoc, q_mdoc, score)` — approximate, defined only for docs with
    * ≥1 probed token. */
  def approxScores(assigned: DataFrame,
      qToks: Array[(Long, Int, Array[Float])],
      probes: Map[Long, Set[Int]]): DataFrame = {
    require(qToks.nonEmpty, "graft: approxScores needs query tokens")
    val s = assigned.sparkSession
    val matrix = qToks.map(_._3.map(_.toDouble))
    val pf = broadcast(probeDf(s, probes))
    // pre-filter to the UNION of probed lists before the projection —
    // the in-memory analog of the on-disk PartitionFilters prune, so
    // non-probed tokens never reach the dequantize+dot kernel (the
    // per-query (q_mdoc, cent) mask still applies after the explode)
    val union = probes.valuesIterator.flatten.toSeq.distinct.sorted
    foldQDots(
      assigned.where(col("cent").isin(union: _*))
        .select(col("mdoc"), col("cent"),
          GraftSqlShim.column(MatVecProject(
            graft.functions.DequantizeI8Expr(
              GraftSqlShim.expression(col("tok_i8")), I8Lo, I8Hi),
            matrix)).as("__qdots")),
      qToks,
      mask = _.join(pf, Seq("q_mdoc", "cent")).drop("cent"))
  }

  /** Stage-1 candidate cut: top `c` docs per query by approximate
    * score (raw doubles, doc-id tiebreak — internal, never surfaced). */
  def candidatePairs(approx: DataFrame, c: Int): DataFrame = {
    require(c >= 1, s"graft: candidatePairs needs c >= 1, got $c")
    val w = Window.partitionBy(col("q_mdoc"))
      .orderBy(col("score").desc, col("mdoc"))
    approx
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= c)
      .select(col("mdoc"), col("q_mdoc"))
  }

  /** PLAID search: probed-centroid approximate scoring (vectors never
    * read), top-`candPerQuery` candidate cut, exact MaxSim rerank of
    * the candidates only — batched over every query doc. Returns exact
    * scores of candidate pairs: `(mdoc, q_mdoc, score)`. `assigned`
    * must be [[assign]]'s output over the CORPUS tokens (query docs
    * excluded). */
  def plaidSearch(assigned: DataFrame,
      qToks: Array[(Long, Int, Array[Float])],
      probes: Map[Long, Set[Int]],
      candPerQuery: Int): DataFrame = {
    val pairs = candidatePairs(
      approxScores(assigned, qToks, probes), candPerQuery)
    rerank(assigned, qToks, pairs)
  }

  /** Exact MaxSim over the candidate pairs only: the corpus scan drops
    * non-candidate docs at the broadcast semi-join before any vector
    * arithmetic or shuffle. */
  def rerank(docToks: DataFrame,
      qToks: Array[(Long, Int, Array[Float])],
      pairs: DataFrame): DataFrame = {
    val candDocs = pairs.select("mdoc").distinct()
    scoreFlat(docToks.join(broadcast(candDocs), "mdoc")
        .select("mdoc", "t_idx", "tok"), qToks)
      .join(broadcast(pairs), Seq("mdoc", "q_mdoc"))
  }

  /** Materialize the assigned token table PARTITIONED BY CENTROID —
    * the on-disk PLAID inverted file. Stage 1 then prunes the listing
    * to the probed centroids' directories and reads only the
    * `(mdoc, tok_i8)` columns; the float vectors live in the same
    * files but are touched only by the candidate rerank. */
  def writeTokenPostings(assigned: DataFrame, path: String): Unit =
    assigned.select(col("mdoc"), col("t_idx"), col("tok"), col("tok_i8"),
        col("cent"))
      // hash-cluster rows by centroid before the partitioned write so
      // each list directory holds one file per writing task, not one
      // per (task × list) — the small-files guard at any scale
      .repartition(col("cent"))
      .write.partitionBy("cent").mode("overwrite").parquet(path)

  /** Append new documents' assigned tokens to an existing
    * [[writeTokenPostings]] table (the `aminsert` analog for the
    * multi-vector inverted file): new files land inside the centroid
    * directories. Stage-1 max and the ascending-query fold are both
    * file-order-independent, so post-append scores are bit-identical
    * to a from-scratch build over the union. Incoming tokens must be
    * assigned with the INDEX's centroids ([[loadCentroids]]), not
    * retrained ones. */
  def appendTokenPostings(assigned: DataFrame, path: String): Unit =
    assigned.select(col("mdoc"), col("t_idx"), col("tok"), col("tok_i8"),
        col("cent"))
      .repartition(col("cent"))
      .write.partitionBy("cent").mode("append").parquet(path)

  /** Partition-pruned read of a [[writeTokenPostings]] table: the
    * `isin` predicate on the partition column prunes at file-listing
    * time (`PartitionFilters` on `cent`). */
  def readTokenPostings(spark: SparkSession, path: String,
      cents: Seq[Int]): DataFrame = {
    require(cents.nonEmpty, "graft: readTokenPostings needs probed centroids")
    spark.read.parquet(path).where(col("cent").isin(cents: _*))
  }

  /** On-disk PLAID search: stage 1 runs over the PRUNED postings read
    * — partition pruning cuts the listing to the probed centroids'
    * directories AND column pruning drops the float vector column (the
    * scan reads doc ids and i8 codes only); stage 2 reranks candidates
    * from the full table behind a broadcast semi-join. Scores are
    * bit-identical to [[plaidSearch]] under the same probes. */
  /** Stage-1 candidate pairs from an on-disk postings table: pruned
    * masked read of the probed centroids' `(mdoc, cent, tok_i8)`
    * columns → approximate scores → top-`cand` cut. The ONE
    * implementation behind both the library search path and the
    * planner exec, so the two can never drift. */
  private[graft] def stage1PairsOnDisk(spark: SparkSession,
      postingsPath: String,
      qToks: Array[(Long, Int, Array[Float])],
      probes: Map[Long, Set[Int]],
      candPerQuery: Int,
      mask: DataFrame => DataFrame): DataFrame = {
    val allCents = probes.valuesIterator.flatten.toSeq.distinct.sorted
    val pruned = mask(readTokenPostings(spark, postingsPath, allCents))
      .select("mdoc", "cent", "tok_i8")
    candidatePairs(approxScores(pruned, qToks, probes), candPerQuery)
  }

  /** Stage-1 candidate doc ids against a [[writeIndex]] layout for ONE
    * query's token matrix — tombstones masked; the planner form's
    * proposal function ([[graft.plans]] MaxSimIdsExec). */
  def candidateIdsOnDisk(spark: SparkSession, path: String,
      qMatrix: Array[Array[Float]], nprobe: Int, cand: Int): Array[Long] = {
    val qToks = qMatrix.zipWithIndex.map { case (v, i) => (0L, i, v) }
    val cents = loadCentroids(spark, path)
    val probes = probeSets(qToks, cents, nprobe)
    stage1PairsOnDisk(spark, postingsDir(spark, path), qToks, probes, cand,
        tombstoneMask(spark, path))
      .select("mdoc").collect().map(_.getLong(0))
  }

  def plaidSearchOnDisk(spark: SparkSession, path: String,
      qToks: Array[(Long, Int, Array[Float])],
      probes: Map[Long, Set[Int]],
      candPerQuery: Int,
      mask: DataFrame => DataFrame = identity): DataFrame = {
    val pairs = stage1PairsOnDisk(spark, path, qToks, probes,
      candPerQuery, mask)
    rerank(mask(spark.read.parquet(path)), qToks, pairs)
  }

  /** Materialize a complete multi-vector index under `path`: the
    * seeded coarse centroids (`centroids/`, tiny), the
    * centroid-partitioned token postings (`postings/`) — the layout
    * [[searchIndex]] serves from — and a metadata file recording the
    * token dim plus (when fixed) `toksPerDoc`, so serving layers
    * derive query tokens from the INDEX's own parameters instead of
    * trusting a user-resupplied flag (a mismatched toksPerDoc slices
    * query docs wrong at the same token dim — silently garbage scores,
    * no error to catch it). `toksPerDoc = 0` records "variable". */
  def writeIndex(toks: DataFrame, path: String, nlists: Int,
      sampleLimit: Int = 16384, seed: Long = 42L,
      toksPerDoc: Int = 0): Unit = {
    val s = toks.sparkSession
    import s.implicits._
    // a REBUILD starts clean: stale tombstones from a previous
    // generation must not mask the fresh postings, and stale committed
    // generations must not out-resolve them
    val tomb = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = tomb.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(tomb)) fs.delete(tomb, true)
    graft.util.Generations.clear(fs,
      new org.apache.hadoop.fs.Path(s"$path/postings"))
    val cents = trainCentroids(toks, nlists, sampleLimit, seed)
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cent", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    writeTokenPostings(assign(toks, cents), s"$path/postings")
    graft.util.MetaJson.write(s, s"$path/meta.json",
      s"""{"toksPerDoc":$toksPerDoc,"dim":${cents.head.length}}""")
  }

  /** (toksPerDoc, token dim) recorded by [[writeIndex]] —
    * (0, centroid dim) for indexes written before the meta file
    * existed or with variable document lengths. */
  /** Layout sniff: a [[writeIndex]] artifact is `centroids` + token
    * postings (legacy `postings` dir or a committed generation) — the
    * detection the CLI validate-index uses. */
  def isMultiVec(spark: SparkSession, path: String): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(s"$path/centroids")) &&
      graft.util.Generations.exists(fs,
        new org.apache.hadoop.fs.Path(s"$path/postings"))
  }

  /** The directory currently serving the token postings: the highest
    * COMMITTED generation ([[graft.util.Generations]] — what
    * [[consolidateIndex]] publishes), or the legacy `postings` dir for
    * an artifact that has never been consolidated. One tiny listing of
    * the artifact root; every reader and appender resolves through
    * here so a consolidation can swap generations with no instant at
    * which the serving path is missing. */
  private[graft] def postingsDir(spark: SparkSession, path: String): String = {
    val base = new org.apache.hadoop.fs.Path(s"$path/postings")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.util.Generations.resolve(fs, base).toString
  }

  def readIndexMeta(spark: SparkSession, path: String): (Int, Int) = {
    val f = s"$path/meta.json"
    graft.util.MetaJson.read(spark, f) match {
      case None => (0, loadCentroids(spark, path).head.length)
      case Some(text) =>
        (graft.util.MetaJson.intField(text, "toksPerDoc", f),
          graft.util.MetaJson.intField(text, "dim", f))
    }
  }

  // Centroid tables are tiny (nlists × dim floats) but live on the
  // serving path of EVERY query — re-reading the parquet per search
  // costs a Spark job each time. Fingerprint-cached (the
  // `ambeginscan` load-and-cache rationale, like graft.ann.GraphCache
  // on executors); a rebuild or recluster changes the files and
  // invalidates.
  def loadCentroids(spark: SparkSession, path: String): Array[Array[Float]] =
    graft.util.ArtifactCache.cached(spark, s"$path/centroids") {
      spark.read.parquet(s"$path/centroids")
        .orderBy(col("cent")).select(col("vec"))
        .collect().map(_.getSeq[Float](0).toArray)
    }

  /** Append new documents into a [[writeIndex]] layout: assign with
    * the PERSISTED centroids and append into the postings directories
    * — the daemon-side incremental path. */
  def appendToIndex(spark: SparkSession, path: String, toks: DataFrame): Unit =
    appendTokenPostings(
      assign(toks, loadCentroids(spark, path)), postingsDir(spark, path))

  /** `ambulkdelete` analog: tombstoned doc ids append to their own
    * parquet dir; every [[searchIndex]] masks them with one anti-join
    * before scoring. Physical postings stay immutable. */
  def deleteDocs(spark: SparkSession, path: String, mdocs: Seq[Long]): Unit = {
    import spark.implicits._
    mdocs.toDF("mdoc").write.mode("append").parquet(s"$path/tombstones")
  }

  /** `validate_index` analog for a [[writeIndex]] layout: structural
    * invariants checked distributively — centroid ids form a dense
    * [0, k) range, every posting's `cent` IS the nearest centroid of
    * its token, every `tok_i8` re-derives from its token, and
    * (mdoc, t_idx) is unique. Checks cover every PHYSICAL posting
    * (tombstone-masked rows included — corruption is corruption) and
    * run as ONE aggregation pass over the postings; throws with the
    * first violated invariant named, returns the physical posting
    * count on success (equals the live count once tombstones have been
    * consolidated).
    *
    * With `source` = (docs table, id column, doc-array column), the
    * CONTENT is additionally re-derived against the table (the
    * reference walks every row the same way,
    * lantern_hnsw/src/hnsw/validate_index.c:436-528): every SERVING
    * posting (tombstoned docs excused — a pending table-first delete
    * is lag, not corruption) must have a source token to re-derive
    * from, every live source token must be posted, and the stored
    * token vector must equal the source token bit-for-bit — a flipped
    * bit in a stored `tok` fails here even though the structural
    * cent/i8 checks (which re-derive from the STORED tok) would pass. */
  def validateIndex(spark: SparkSession, path: String,
      source: Option[(DataFrame, String, String)] = None): Long = {
    val centRows = spark.read.parquet(s"$path/centroids")
      .orderBy(col("cent")).select(col("cent"), col("vec")).collect()
    val ids = centRows.map(_.getInt(0))
    require(ids.toSeq == ids.indices.toSeq,
      s"graft: centroid ids not dense [0, ${ids.length}): " +
        ids.take(8).mkString(", "))
    val cents = centRows.map(_.getSeq[Float](1).toArray)
    val post = spark.read.parquet(postingsDir(spark, path))
    val flag = (c: Column) => sum(when(c, 1L).otherwise(0L))
    val r = post
      .withColumn("__cent", GraftSqlShim.column(NearestCentroid(
        GraftSqlShim.expression(col("tok")), cents)))
      .withColumn("__i8", GraftSqlShim.column(graft.functions.QuantizeI8Expr(
        GraftSqlShim.expression(col("tok")), I8Lo, I8Hi)))
      .agg(
        flag(col("cent") =!= col("__cent")).as("badCent"),
        flag(col("tok_i8") =!= col("__i8")).as("badI8"),
        count(lit(1)).as("n"),
        countDistinct(col("mdoc"), col("t_idx")).as("keys"))
      .head()
    val (badCent, badI8, n, keys) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    require(badCent == 0,
      s"graft: $badCent postings filed under a non-nearest centroid")
    require(badI8 == 0, s"graft: $badI8 postings with stale i8 codes")
    require(n == keys, s"graft: ${n - keys} duplicate (mdoc, t_idx) postings")
    source.foreach { case (df, idCol, vecCol) =>
      val derived = df.select(col(idCol).cast("long").as("mdoc"),
        posexplode(col(vecCol)).as(Seq("t_idx", "__exp_tok")))
      val unmasked = tombstoneMask(spark, path)
      val orphan = unmasked(post.select(col("mdoc"), col("t_idx")))
        .join(derived.select("mdoc", "t_idx"), Seq("mdoc", "t_idx"),
          "left_anti")
        .limit(1).collect()
      if (orphan.nonEmpty) throw new IllegalStateException(
        s"graft: multivec index $path invalid — posting (mdoc " +
          s"${orphan.head.getLong(0)}, t_idx ${orphan.head.get(1)}) has " +
          "no source token to re-derive from")
      val missing = unmasked(
          derived.select("mdoc", "t_idx")
            .join(post.select("mdoc", "t_idx"), Seq("mdoc", "t_idx"),
              "left_anti"))
        .limit(1).collect()
      if (missing.nonEmpty) throw new IllegalStateException(
        s"graft: multivec index $path invalid — source token (mdoc " +
          s"${missing.head.getLong(0)}, t_idx ${missing.head.get(1)}) " +
          "is not posted (missing row)")
      val drift = post.select(col("mdoc"), col("t_idx"), col("tok"))
        .join(derived, Seq("mdoc", "t_idx"))
        .where(!(col("tok") <=> col("__exp_tok")))
        .select("mdoc", "t_idx").limit(1).collect()
      if (drift.nonEmpty) throw new IllegalStateException(
        s"graft: multivec index $path invalid — stored token (mdoc " +
          s"${drift.head.getLong(0)}, t_idx ${drift.head.get(1)}) does " +
          "not re-derive from its source row")
    }
    n
  }

  /** Consolidate a [[writeIndex]] layout (the `consolidate`/VACUUM
    * analog): rewrite the append-accumulated postings back to one file
    * per centroid directory and apply tombstones PHYSICALLY — masked
    * docs leave the postings and the tombstone dir resets. Scores are
    * unchanged by construction (stage-1 max and the ordered query fold
    * are file-order-independent), so a search before == after, minus
    * the deleted docs. A MAINTENANCE operation, single-writer for the
    * POSTINGS like `writeIndex` — but [[deleteDocs]] may race it
    * safely: tombstone files are snapshotted up front, only the
    * snapshot is applied and retired, and files appended during the
    * compaction survive and keep masking. The compacted postings are
    * published as a new COMMITTED GENERATION
    * ([[graft.util.Generations]]): the data is fully written under a
    * staging name, a marker-file create is the atomic commit, and the
    * previous generation is deleted only afterwards — so a racing
    * reader resolving [[postingsDir]] finds a complete generation at
    * every instant, on any store, atomic directory rename or not.
    * Refuses to consolidate an index whose every doc is tombstoned —
    * that would leave no readable postings (drop and rebuild
    * instead). */
  def consolidateIndex(spark: SparkSession, path: String): Unit =
    consolidateIndex(spark, path, () => ())

  /** Test seams: `afterCompact` runs once the compacted postings are
    * fully staged, before the commit; `beforeOldDelete` runs after the
    * new generation is committed, before the previous one is deleted —
    * the window where the old swap could expose a missing dir and a
    * generation-resolving reader must not. */
  private[ops] def consolidateIndex(spark: SparkSession, path: String,
      afterCompact: () => Unit,
      beforeOldDelete: () => Unit = () => ()): Unit = {
    // snapshot the tombstone FILES first: only the snapshot is applied
    // physically and retired, so a deleteDocs racing the compaction
    // (a lightweight call users needn't treat as a writer) keeps its
    // tombstones — they survive the swap and keep masking
    val tombDir = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val tfs = tombDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapshot: Seq[org.apache.hadoop.fs.Path] =
      if (tfs.exists(tombDir))
        tfs.listStatus(tombDir).filter(_.isFile).map(_.getPath).toSeq
      else Seq.empty
    val snapParquet = snapshot.filter(_.getName.endsWith(".parquet"))
    val masked: DataFrame => DataFrame =
      if (snapParquet.nonEmpty) {
        val tomb = broadcast(
          spark.read.parquet(snapParquet.map(_.toString): _*).distinct())
        df => df.join(tomb, Seq("mdoc"), "left_anti")
      } else identity
    val live = masked(spark.read.parquet(postingsDir(spark, path)))
    require(!live.isEmpty,
      s"graft: consolidate would leave an empty index under $path " +
        "(every doc tombstoned) — drop and rebuild instead")
    val base = new org.apache.hadoop.fs.Path(s"$path/postings")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // debris from a writer that crashed between publish and commit
    // never serves, but it occupies generation numbers — clear it
    // (single-writer maintenance makes this safe)
    graft.util.Generations.clearStale(fs, base)
    val (staging, gen) = graft.util.Generations.stage(fs, base)
    live.select(col("mdoc"), col("t_idx"), col("tok"), col("tok_i8"),
        col("cent"))
      .repartition(col("cent"))
      .write.partitionBy("cent").mode("overwrite").parquet(staging.toString)
    afterCompact()
    val previous = graft.util.Generations.commit(fs, base, staging, gen)
    beforeOldDelete()
    previous.foreach(p => fs.delete(p, true))
    // retire ONLY the snapshotted tombstone files; files appended
    // during the compaction stay and keep masking their (still
    // physically present) docs until the next consolidation. The
    // directory itself is removed with a NON-recursive delete of the
    // listed leftovers + the dir: a tombstone parquet landing between
    // the list and the delete makes the final rmdir fail harmlessly
    // (the dir stays, the late file keeps masking) instead of being
    // wiped recursively
    snapshot.foreach(p => tfs.delete(p, false))
    if (tfs.exists(tombDir)) {
      val leftovers = tfs.listStatus(tombDir).filter(_.isFile)
      if (leftovers.forall(st => !st.getPath.getName.endsWith(".parquet"))) {
        leftovers.foreach(st => tfs.delete(st.getPath, false))
        try { tfs.delete(tombDir, false); () }
        catch { case _: java.io.IOException => () } // late arrival — keep
      }
    }
    ()
  }

  /** Resolve the tombstone mask ONCE per search: one fs.exists, one
    * read; the returned function anti-joins it into both scans. */
  private def tombstoneMask(spark: SparkSession,
      path: String): DataFrame => DataFrame = {
    val t = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(t)) {
      val tomb = broadcast(spark.read.parquet(t.toString).distinct())
      post => post.join(tomb, Seq("mdoc"), "left_anti")
    } else identity
  }

  /** PLAID search against a [[writeIndex]] layout: resolve probes from
    * the persisted centroids, mask tombstoned docs, stage-1 over the
    * pruned postings read, exact rerank — per-query top-k rows
    * `(q_mdoc, mdoc, score)`. */
  def searchIndex(spark: SparkSession, path: String,
      qToks: Array[(Long, Int, Array[Float])], k: Int,
      nprobe: Int, candPerQuery: Int): DataFrame = {
    val cents = loadCentroids(spark, path)
    val probes = probeSets(qToks, cents, nprobe)
    topKPerQuery(
      plaidSearchOnDisk(spark, postingsDir(spark, path), qToks, probes,
        candPerQuery, mask = tombstoneMask(spark, path)), k)
  }

  /** Batched PLAID search against a [[writeIndex]] layout with
    * searchMany's output contract — the lateral/kNN-join serving path
    * ([[graft.plans]] AnnKnnJoinExec, kind = "multivec"): ALL queries'
    * tokens ride one probe-set resolution, one pruned stage-1 pass and
    * one candidate rerank; output `(query_id, neighbor_id, dist,
    * rank ≤ k)` where `dist` is the EXACT MaxSim score and rank orders
    * DESCENDING by it (doc-id tiebreak) — bigger is better, unlike the
    * distance kinds, but the rank column carries the same
    * best-first contract every consumer sorts by. */
  def searchManyOnDisk(spark: SparkSession, path: String,
      queries: Seq[(Long, Array[Array[Float]])], k: Int,
      nprobe: Int, candPerQuery: Int): DataFrame = {
    require(queries.nonEmpty, "graft: searchManyOnDisk needs queries")
    require(k >= 1, s"graft: searchManyOnDisk needs k >= 1, got $k")
    val qToks: Array[(Long, Int, Array[Float])] = queries.toArray.flatMap {
      case (qid, m) =>
        require(m.nonEmpty, s"graft: query $qid has an empty token matrix")
        m.zipWithIndex.map { case (v, i) => (qid, i, v) }
    }
    val cents = loadCentroids(spark, path)
    val probes = probeSets(qToks, cents, nprobe)
    val scored = plaidSearchOnDisk(spark, postingsDir(spark, path), qToks,
      probes, candPerQuery, mask = tombstoneMask(spark, path))
    val w = Window.partitionBy(col("q_mdoc"))
      .orderBy(col("score").desc, col("mdoc"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_mdoc").as("query_id"), col("mdoc").as("neighbor_id"),
        col("score").as("dist"), col("rank"))
  }

  /** Per-query top-k cut on the ROUNDED score (descending, doc-id
    * tiebreak) — the gate-side boundary protocol. */
  def topKPerQuery(scored: DataFrame, k: Int, dp: Int = 4): DataFrame = {
    require(k >= 1, s"graft: topKPerQuery needs k >= 1, got $k")
    val w = Window.partitionBy(col("q_mdoc"))
      .orderBy(col("score").desc, col("mdoc"))
    scored
      .withColumn("score", round(col("score"), dp))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .select(col("q_mdoc"), col("mdoc"), col("score"))
  }
}
