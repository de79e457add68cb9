package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.sparse_dot

/** Learned-sparse retrieval (SPLADE / uniCOIL-style impact vectors;
  * the sparse analog of the engine's dense kNN surface, and the
  * `sparsevec` capability of the pgvector family the reference engine
  * belongs to).
  *
  * Representation: `struct<indices: array<int>, values: array<float>>`
  * with strictly increasing indices and non-negative impact weights —
  * the canonical postings layout ([[sparsify]] produces it from a
  * dense activation vector by ReLU-thresholding, the standard SPLADE
  * sparsification: Formal et al., "SPLADE: Sparse Lexical and
  * Expansion Model for First Stage Ranking", SIGIR 2021).
  *
  * Two physical search paths with IDENTICAL results:
  *
  *  - [[topK]] — one codegen'd [[graft.functions.SparseDot]] per row,
  *    `TakeOrderedAndProject` reduction: per-partition top-k heaps,
  *    k·P-row driver merge, no shuffle. The right shape when the
  *    sparse column is already materialized row-wise.
  *  - [[postings]] + [[invertedTopK]] — the inverted-index form: the
  *    corpus explodes ONCE into a (term, doc, weight) postings table
  *    (at scale: written out hash-bucketed BY TERM, so a query prunes
  *    to its own terms' buckets and reads nothing else); search is a
  *    broadcast join of the tiny query-term table against the
  *    postings, a per-doc sum, and a top-k. Matched postings per doc
  *    are bounded by the QUERY's nnz, so the per-group state is O(|q|)
  *    regardless of corpus size.
  *
  * On-disk layout ([[writePostings]]): the postings are partitioned by
  * `tb = term mod buckets` — a BOUNDED directory fan-out (a SPLADE
  * vocabulary is 30k+ live terms; partition-per-term would make the
  * directory count itself a listing/metadata scale-killer) — and
  * hash-clustered by bucket before the write so each bucket directory
  * holds one file per write, not one per (task × bucket). A query
  * still prunes at FILE-LISTING time: its terms map to a bucket set,
  * `PartitionFilters` on `tb` cuts the listing to those directories,
  * and the residual `term IN (...)` predicate pushes into the parquet
  * row-group scan. Bucket count and the id column name persist in a
  * metadata file inside the table, so readers never re-guess them.
  *
  * Lifecycle (the `ambulkdelete` / `consolidate_bm25_table` analog —
  * reference semantics lantern_hnsw/src/hnsw/delete.c:15-73,
  * lantern_extras/src/bm25_api.sql:108-165): [[deletePostings]]
  * appends tombstoned doc ids under an underscore-prefixed directory
  * (invisible to the parquet scan); every [[readPostings]] masks them
  * with one broadcast anti-join; [[consolidatePostings]] compacts the
  * append-accumulated files back to one per bucket, applies tombstones
  * physically, and publishes the result as a new committed data
  * generation — preserving any tombstone files appended concurrently
  * with the compaction.
  *
  * Determinism contract: both search paths accumulate matched products
  * in ascending-index order in double (the merge in `SparseDot`; a
  * sorted-struct fold in [[invertedTopK]]), so their scores are
  * bit-identical to each other and to a SQL replay — the same
  * oracle-matchability contract as the dense distance expressions.
  */
object SparseSearch {

  /** Default term-bucket count for the on-disk layout: 64 directories
    * bound the listing at any vocabulary size while a typical query
    * (nnz 5–50) still prunes to well under the full set. */
  val DefaultBuckets = 64

  private val MetaFile = "_graft_sparse_meta.json"
  private val TombDir = "_tombstones"

  /** Sparse struct column from a dense vector: keep coordinates with
    * activation ≥ `tau` (ReLU threshold — non-negative impacts only),
    * indices ascending. Pure built-ins, stays in whole-stage codegen. */
  def sparsify(vec: Column, tau: Float): Column = {
    val pairs = filter(
      transform(vec, (x, i) => struct(i.cast("int").as("i"), x.as("x"))),
      p => p.getField("x") >= lit(tau))
    struct(
      transform(pairs, p => p.getField("i")).as("indices"),
      transform(pairs, p => p.getField("x")).as("values"))
  }

  /** Sparse query struct literal from driver-side arrays (indices must
    * be strictly increasing). */
  def queryLit(qIdx: Seq[Int], qVal: Seq[Float]): Column = {
    require(qIdx.length == qVal.length,
      s"graft: sparse query indices/values length mismatch: " +
        s"${qIdx.length} vs ${qVal.length}")
    require(qIdx.isEmpty || qIdx.zip(qIdx.tail).forall { case (a, b) => a < b },
      "graft: sparse query indices must be strictly increasing")
    struct(typedlit(qIdx).as("indices"), typedlit(qVal).as("values"))
  }

  /** Exact top-k by sparse dot product (descending; zero-overlap docs
    * score 0 and are excluded). One map-side expression per row +
    * `TakeOrderedAndProject` — no shuffle, no UDF. */
  def topK(
      docs: DataFrame,
      idCol: String,
      sv: Column,
      query: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"graft: sparse topK needs k >= 1, got $k")
    docs
      .select(col(idCol), sparse_dot(sv, query).as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Explode a sparse column into the postings form
    * `(term: int, <idCol>, w: float)` — [[writePostings]] materializes
    * it term-bucketed so queries touch only their own terms' buckets. */
  def postings(docs: DataFrame, idCol: String, sv: Column): DataFrame =
    docs
      .select(col(idCol), sv.getField("indices").as("__ti"),
        sv.getField("values").as("__tv"))
      .select(col(idCol), posexplode(col("__ti")).as(Seq("__p", "term")),
        col("__tv"))
      .select(col("term"), col(idCol),
        element_at(col("__tv"), col("__p") + 1).as("w"))

  // ------------------------------------------------------------- meta

  private def fsFor(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeMeta(spark: SparkSession, path: String,
      buckets: Int, idCol: String): Unit =
    graft.util.MetaJson.write(spark, s"$path/$MetaFile",
      s"""{"buckets":$buckets,"idCol":"$idCol"}""")

  /** Layout sniff: a [[writePostings]] table carries its meta file at
    * the root — the detection the CLI validate-index dispatch uses. */
  def isSparse(spark: SparkSession, path: String): Boolean =
    fsFor(spark, path).exists(new Path(s"$path/$MetaFile"))

  /** The directory currently holding the postings DATA: the highest
    * COMMITTED `data_gNNNNNN` generation inside the table root
    * ([[graft.util.Generations]] — what [[consolidatePostings]]
    * publishes), or the root itself for a table that has never been
    * consolidated (legacy layout: `tb=*` dirs at the root, beside the
    * meta file and tombstones, which always stay at the root). One
    * tiny listing; every reader and appender resolves through here so
    * a consolidation can swap generations with no instant at which
    * the serving data is missing. */
  private[graft] def dataDir(spark: SparkSession, path: String): String = {
    val fs = fsFor(spark, path)
    val base = new Path(s"$path/data")
    val r = graft.util.Generations.resolve(fs, base)
    if (r == base) path else r.toString
  }

  /** (buckets, idCol) of a [[writePostings]] table — the layout
    * parameters every reader and appender must share; trusting a
    * caller-resupplied value instead would silently mis-bucket. */
  def readMeta(spark: SparkSession, path: String): (Int, String) = {
    val f = s"$path/$MetaFile"
    val text = graft.util.MetaJson.readRequired(spark, f,
      "not a sparse postings table")
    (graft.util.MetaJson.intField(text, "buckets", f),
      graft.util.MetaJson.strField(text, "idCol", f))
  }

  private def idColOf(post: DataFrame): String = {
    val rest = post.columns.filterNot(Set("term", "w"))
    require(rest.length == 1,
      s"graft: postings must be (term, <id>, w), got " +
        post.columns.mkString(", "))
    rest.head
  }

  /** `validate_index` analog for the sparse inverted file (reference
    * validate_index.c:436-528 validates every index it has): checks
    * meta coherence, that EVERY posting is filed under
    * `pmod(term, buckets)` (a mis-bucketed posting is invisible to the
    * pruned read — silent recall loss), that no posting carries a
    * null/negative term or null id/weight, and that no tombstone
    * references an id absent from the postings (an orphan tombstone is
    * a delete that never happened). Throws [[IllegalStateException]]
    * naming the FIRST violation; returns the live posting count when
    * valid. */
  def validatePostings(spark: SparkSession, path: String,
      source: Option[(DataFrame, String, String)] = None): Long = {
    val (buckets, idCol) = readMeta(spark, path)
    if (buckets < 1) throw new IllegalStateException(
      s"graft: sparse index $path invalid — meta buckets $buckets < 1")
    val post = spark.read.parquet(dataDir(spark, path))
    val cols = post.columns.toSet
    for (c <- Seq("term", idCol, "w", "tb"))
      if (!cols.contains(c)) throw new IllegalStateException(
        s"graft: sparse index $path invalid — missing column '$c'")
    val nullRow = post.where(col("term").isNull || col("term") < 0 ||
        col(idCol).isNull || col("w").isNull).limit(1).collect()
    if (nullRow.nonEmpty) throw new IllegalStateException(
      s"graft: sparse index $path invalid — posting with null/negative " +
        s"field: ${nullRow.head}")
    val misfiled = post
      .where(col("tb") =!= pmod(col("term"), lit(buckets)))
      .select(col("term"), col("tb")).limit(1).collect()
    if (misfiled.nonEmpty) throw new IllegalStateException(
      s"graft: sparse index $path invalid — term ${misfiled.head.get(0)} " +
        s"filed under bucket ${misfiled.head.get(1)}, expected " +
        s"pmod(term, $buckets) = ${
          ((misfiled.head.getInt(0) % buckets) + buckets) % buckets}")
    val tombP = new Path(s"$path/$TombDir")
    if (fsFor(spark, path).exists(tombP)) {
      val orphan = spark.read.parquet(tombP.toString).distinct()
        .join(post.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
        .limit(1).collect()
      if (orphan.nonEmpty) throw new IllegalStateException(
        s"graft: sparse index $path invalid — tombstone id " +
          s"${orphan.head.get(0)} references no posting (orphan delete)")
    }
    // content re-derivation against the source table (the reference
    // walks every row the same way, validate_index.c:436-528): the
    // SAME `postings` explode the builder used, so a green run is
    // bit-identity evidence — a flipped bit in a stored weight fails
    // here even though the structural checks above would pass. The
    // SERVING set is what's compared (tombstoned ids excused in both
    // directions: a pending table-first delete is lag, not corruption).
    source.foreach { case (df, srcIdCol, svCol) =>
      val derived = postings(
        df.select(col(srcIdCol).cast("long").as(idCol), col(svCol)),
        idCol, col(svCol))
        .select(col("term"), col(idCol), col("w").as("__exp_w"))
      val unmasked = tombstoneMask(spark, path, idCol)
      val orphanP = unmasked(post.select(col("term"), col(idCol)))
        .join(derived.select(col("term"), col(idCol)),
          Seq("term", idCol), "left_anti")
        .limit(1).collect()
      if (orphanP.nonEmpty) throw new IllegalStateException(
        s"graft: sparse index $path invalid — posting (term " +
          s"${orphanP.head.get(0)}, $idCol ${orphanP.head.get(1)}) has " +
          "no source entry to re-derive from")
      val missing = unmasked(
          derived.select(col("term"), col(idCol))
            .join(post.select(col("term"), col(idCol)),
              Seq("term", idCol), "left_anti"))
        .limit(1).collect()
      if (missing.nonEmpty) throw new IllegalStateException(
        s"graft: sparse index $path invalid — source entry (term " +
          s"${missing.head.get(0)}, $idCol ${missing.head.get(1)}) is " +
          "not posted (missing row)")
      val drift = post.select(col("term"), col(idCol), col("w"))
        .join(derived, Seq("term", idCol))
        .where(!(col("w") <=> col("__exp_w")))
        .select(col("term"), col(idCol)).limit(1).collect()
      if (drift.nonEmpty) throw new IllegalStateException(
        s"graft: sparse index $path invalid — stored weight (term " +
          s"${drift.head.get(0)}, $idCol ${drift.head.get(1)}) does not " +
          "re-derive from its source row")
    }
    post.count()
  }

  // ------------------------------------------------------------ write

  /** Materialize the postings table hash-bucketed by term — the
    * bounded inverted-index layout on disk. `pmod(term, buckets)` is
    * the partition column: the directory count is `buckets` regardless
    * of vocabulary size, a query prunes the listing to its terms'
    * bucket set ([[readPostings]]), and the `repartition` clusters
    * rows so each bucket directory receives ONE file per write instead
    * of one per writing task — the small-files guard at any scale. */
  def writePostings(post: DataFrame, path: String,
      buckets: Int = DefaultBuckets): Unit = {
    require(buckets >= 1, s"graft: buckets must be >= 1, got $buckets")
    val idCol = idColOf(post)
    post.withColumn("tb", pmod(col("term"), lit(buckets)))
      .repartition(col("tb"))
      .write.partitionBy("tb").mode("overwrite").parquet(path)
    // overwrite mode clears the directory first — including any
    // committed data_g* generation dirs, which bypasses the mutators
    // that normally invalidate the resolve memo; drop it by hand
    graft.util.Generations.invalidate(
      fsFor(post.sparkSession, path), new Path(s"$path/data"))
    writeMeta(post.sparkSession, path, buckets, idCol)
  }

  /** Append new documents' postings to an existing [[writePostings]]
    * table (the `aminsert` analog for the inverted file): rows bucket
    * with the TABLE's persisted bucket count (a resupplied one could
    * silently mis-bucket), cluster per bucket (one new file per bucket
    * per append), and land inside the bucket directories. Scoring
    * folds per-doc postings in TERM order, so results are
    * file-order-independent and bit-identical to a from-scratch build
    * over the union. */
  def appendPostings(post: DataFrame, path: String): Unit = {
    val (buckets, idCol) = readMeta(post.sparkSession, path)
    require(idColOf(post) == idCol,
      s"graft: append id column '${idColOf(post)}' != table's '$idCol'")
    post.withColumn("tb", pmod(col("term"), lit(buckets)))
      .repartition(col("tb"))
      .write.partitionBy("tb").mode("append")
      .parquet(dataDir(post.sparkSession, path))
  }

  // ------------------------------------------------------------- read

  /** Bucket-pruned, tombstone-masked read of a [[writePostings]]
    * table, restricted to the query's terms: the `isin` predicate on
    * the bucket partition column prunes at FILE-LISTING time
    * (`PartitionFilters` in the scan — I/O proportional to the query
    * terms' buckets, not the corpus), the residual `term IN (...)`
    * pushes into the parquet row-group scan, and tombstoned docs drop
    * behind one broadcast anti-join. Output columns: (term, <id>, w). */
  def readPostings(
      spark: SparkSession,
      path: String,
      qIdx: Seq[Int]): DataFrame = {
    require(qIdx.nonEmpty, "graft: readPostings needs at least one query term")
    val (buckets, idCol) = readMeta(spark, path)
    val tbs = qIdx.map(i => math.floorMod(i, buckets)).distinct.sorted
    val pruned = spark.read.parquet(dataDir(spark, path))
      .where(col("tb").isin(tbs: _*) && col("term").isin(qIdx: _*))
      .select(col("term"), col(idCol), col("w"))
    tombstoneMask(spark, path, idCol)(pruned)
  }

  // -------------------------------------------------------- lifecycle

  /** `ambulkdelete` analog: tombstoned doc ids append to an
    * underscore-prefixed directory inside the table (invisible to the
    * parquet scan); every [[readPostings]] masks them with one
    * broadcast anti-join. Physical postings stay immutable until
    * [[consolidatePostings]]. */
  def deletePostings(spark: SparkSession, path: String,
      ids: Seq[Long]): Unit = {
    import spark.implicits._
    val (_, idCol) = readMeta(spark, path)
    ids.toDF(idCol).write.mode("append").parquet(s"$path/$TombDir")
  }

  /** Anti-join `df` against `path`'s tombstones on `idCol` (no-op when
    * none exist) — for callers that score OUTSIDE [[readPostings]],
    * like the planner form's starvation fallback: a doc deleted from
    * the postings must not resurface through a table-side scan. */
  def maskTombstones(df: DataFrame, path: String, idCol: String): DataFrame =
    tombstoneMask(df.sparkSession, path, idCol)(df)

  /** Resolve the tombstone mask ONCE per read: one fs.exists, one
    * read; the returned function anti-joins it into the scan. */
  private def tombstoneMask(spark: SparkSession, path: String,
      idCol: String): DataFrame => DataFrame = {
    val t = new Path(s"$path/$TombDir")
    if (fsFor(spark, path).exists(t)) {
      val tomb = broadcast(spark.read.parquet(t.toString).distinct())
      post => post.join(tomb, Seq(idCol), "left_anti")
    } else identity
  }

  /** Consolidate a [[writePostings]] table (the `consolidate`/VACUUM
    * analog): rewrite the append-accumulated files back to ONE per
    * bucket directory and apply tombstones PHYSICALLY — masked docs
    * leave the postings. Scores are unchanged by construction (the
    * per-doc fold is term-ordered, file-order-independent), so a
    * search before == after, minus the deleted docs.
    *
    * A MAINTENANCE operation, single-writer for the POSTINGS (like
    * every index build here). The table root itself NEVER moves: the
    * compacted data is published as a new committed `data_gNNNNNN`
    * generation inside it ([[graft.util.Generations]] — staged fully,
    * then an atomic marker-file create commits it, and only then is
    * the previous generation deleted), so a racing reader resolving
    * [[dataDir]] finds complete data at every instant on any store —
    * and a concurrent [[deletePostings]] (a lightweight call a user
    * may issue any time) cannot collide with a root rename, because
    * there is none: its tombstone files land at the stable
    * `_tombstones` root dir, only the pre-compaction SNAPSHOT of which
    * is applied physically and retired — files appended during the
    * compaction simply stay and keep masking. This retires the entire
    * stub-harvest retry protocol the old root-swap needed. */
  def consolidatePostings(spark: SparkSession, path: String): Unit =
    consolidatePostings(spark, path, () => ())

  /** Test seams: `afterCompact` runs once the compacted data is fully
    * staged, before the commit (a delete landing here survives as a
    * late tombstone file and keeps masking); `beforeOldDelete` runs
    * after the new generation is committed, before the previous data
    * is deleted — the window where the old two-rename swap could
    * expose a missing table and a generation-resolving reader must
    * not. */
  private[ops] def consolidatePostings(spark: SparkSession, path: String,
      afterCompact: () => Unit,
      beforeOldDelete: () => Unit = () => ()): Unit = {
    val (buckets, idCol) = readMeta(spark, path)
    val fs = fsFor(spark, path)
    val tombPath = new Path(s"$path/$TombDir")
    // snapshot the tombstone file list NOW: these (and only these) are
    // applied physically and retired; later arrivals survive the swap
    val snapshot: Seq[Path] =
      if (fs.exists(tombPath))
        fs.listStatus(tombPath).filter(_.isFile).map(_.getPath).toSeq
      else Seq.empty
    val snapParquet = snapshot.filter(_.getName.endsWith(".parquet"))
    val masked: DataFrame => DataFrame =
      if (snapParquet.nonEmpty) {
        val tomb = broadcast(
          spark.read.parquet(snapParquet.map(_.toString): _*).distinct())
        df => df.join(tomb, Seq(idCol), "left_anti")
      } else identity
    val cur = dataDir(spark, path)
    val live = masked(spark.read.parquet(cur))
    require(!live.isEmpty,
      s"graft: consolidate would leave an empty postings table under " +
        s"$path (every doc tombstoned) — drop and rebuild instead")
    val base = new Path(s"$path/data")
    // crashed-writer debris (uncommitted gen dirs, staging leftovers)
    // never serves but occupies numbers AND reads as permanent
    // fragmentation in the root-listing file count — clear it
    // (single-writer maintenance makes this safe)
    graft.util.Generations.clearStale(fs, base)
    val (staging, gen) = graft.util.Generations.stage(fs, base)
    live.select(col("term"), col(idCol), col("w"), col("tb"))
      .repartition(col("tb"))
      .write.partitionBy("tb").mode("overwrite").parquet(staging.toString)
    afterCompact()
    val previous = graft.util.Generations.commit(fs, base, staging, gen)
    beforeOldDelete()
    // delete the data the new generation replaces: older generation
    // dirs whole; for the LEGACY layout (data at the root) only its
    // `tb=*` bucket dirs — the meta file and tombstones live at the
    // root permanently and must survive
    previous.foreach(p => fs.delete(p, true))
    val rootBuckets = fs.listStatus(new Path(path)).filter(st =>
      st.isDirectory && st.getPath.getName.startsWith("tb="))
    rootBuckets.foreach(st => fs.delete(st.getPath, true))
    // retire ONLY the snapshotted tombstone files; files appended
    // during the compaction stay and keep masking their (still
    // physically present) docs until the next consolidation
    snapshot.foreach(p => fs.delete(p, false))
    if (fs.exists(tombPath) &&
        fs.listStatus(tombPath).forall(st =>
          st.isFile && !st.getPath.getName.endsWith(".parquet"))) {
      fs.listStatus(tombPath).foreach(st => fs.delete(st.getPath, false))
      try { fs.delete(tombPath, false); () }
      catch { case _: java.io.IOException => () } // late arrival — keep
    }
    ()
  }

  // ------------------------------------------------------------ score

  /** Inverted-index top-k: broadcast the query's (term, weight) rows
    * against the postings, sum per doc, cut top-k. The per-doc fold
    * runs over the matched postings sorted by term — ascending-index
    * order, so scores are bit-identical to [[topK]]'s merge (collected
    * state per doc is ≤ the query's nnz, driver-independent). */
  def invertedTopK(
      post: DataFrame,
      idCol: String,
      qIdx: Seq[Int],
      qVal: Seq[Float],
      k: Int): DataFrame = {
    require(k >= 1, s"graft: sparse invertedTopK needs k >= 1, got $k")
    require(qIdx.length == qVal.length,
      s"graft: sparse query indices/values length mismatch: " +
        s"${qIdx.length} vs ${qVal.length}")
    val s = post.sparkSession
    import s.implicits._
    val q = qIdx.zip(qVal).toDF("term", "qw")
    post
      .join(broadcast(q), "term")
      .select(col(idCol),
        struct(col("term"),
          (col("w").cast("double") * col("qw").cast("double")).as("prod"))
          .as("tp"))
      .groupBy(col(idCol))
      .agg(aggregate(sort_array(collect_list(col("tp"))), lit(0.0),
        (acc, x) => acc + x.getField("prod")).as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Batched multi-query inverted top-k — N queries in ONE postings
    * pass: every query's (query_id, term, qw) rows broadcast against
    * the postings together, the per-(doc, query) fold runs term-
    * ordered exactly like [[invertedTopK]] (so scores are bit-equal to
    * a per-query loop), and a per-query rank window cuts to k (Spark 4
    * plans it as a partial WindowGroupLimit). Postings I/O is
    * independent of the query count — the searchMany contract every
    * index family here serves. Output: `(query_id, neighbor_id,
    * score, rank ≤ k)`, rank descending by score, id tiebreak. */
  def searchMany(
      post: DataFrame,
      idCol: String,
      queries: Seq[(Long, Seq[Int], Seq[Float])],
      k: Int): DataFrame = {
    require(k >= 1, s"graft: sparse searchMany needs k >= 1, got $k")
    require(queries.nonEmpty, "graft: sparse searchMany needs queries")
    queries.foreach { case (qid, is, vs) =>
      require(is.length == vs.length,
        s"graft: query $qid indices/values length mismatch: " +
          s"${is.length} vs ${vs.length}")
    }
    val s = post.sparkSession
    import s.implicits._
    val q = queries
      .flatMap { case (qid, is, vs) => is.zip(vs).map(p => (qid, p._1, p._2)) }
      .toDF("query_id", "term", "qw")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    post
      .join(broadcast(q), "term")
      .select(col("query_id"), col(idCol).cast("long").as("neighbor_id"),
        struct(col("term"),
          (col("w").cast("double") * col("qw").cast("double")).as("prod"))
          .as("tp"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(aggregate(sort_array(collect_list(col("tp"))), lit(0.0),
        (acc, x) => acc + x.getField("prod")).as("score"))
      .where(col("score") > 0)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** [[searchMany]] against a [[writePostings]] table: ONE pruned read
    * of the UNION of every query's terms' buckets (tombstones masked),
    * then the batched fold — the on-disk lateral/kNN-join serving
    * shape. */
  def searchManyOnDisk(
      spark: SparkSession,
      path: String,
      queries: Seq[(Long, Seq[Int], Seq[Float])],
      k: Int): DataFrame = {
    require(queries.nonEmpty, "graft: sparse searchManyOnDisk needs queries")
    val (_, idCol) = readMeta(spark, path)
    val allTerms = queries.flatMap(_._2).distinct
    searchMany(readPostings(spark, path, allTerms), idCol, queries, k)
  }
}
