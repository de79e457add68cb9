package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

import graft.ann.{AnnIndex, GraphCache, Metric}
import graft.functions.{CosDist, HammingDist, InnerProduct, L2SqDist, MaxSimScore, MaxSimScoreCol}

/** Registry mapping a table's storage root path → its ANN index artifact.
  * The Spark analog of "this column has a lantern_hnsw index": the
  * planner rule consults it to decide index-or-not, like the reference's
  * order-by-only cost model (lantern_hnsw/src/hnsw.c:150-209 — cost = ∞
  * unless `ORDER BY v <op> const LIMIT k`).
  */
object AnnCatalog {
  /** `kind`: "hnsw" (float graph shards), "ivf" (partition-pruned
    * lists), "pq" (code shards searched via LUT, candidates emitted
    * as dequantized vectors), "ivfpq" (coarse lists of residual
    * codes), or "bq" (sign-bit signatures; hamming pre-rank + exact
    * rescore via the join-back — `ef` is the rescore pool). A table
    * may carry several indexes (different columns/metrics), like
    * multiple lantern indexes on one table — the rule picks the one
    * matching the sort expression.
    */
  /** `nprobe` applies to the coarse-list kinds (`"ivf"`, `"ivfpq"`)
    * only: number of coarse lists to probe (clamped to nlists by the
    * scan). 0 = unset → the IVF default (8). It deliberately does NOT
    * inherit `ef`: a graph-search ef like 64 on a 16-list index would
    * probe every list — a full table scan wearing an index costume.
    * (`ef` still applies to "ivfpq" as the LUT candidate-pool width.) */
  /** `kind = "multivec"`: a [[graft.ops.MultiVec.writeIndex]] layout
    * over a doc-array column (`array<array<float>>`), registered under
    * `metric = "maxsim"` — `ef` is the stage-1 candidate budget per
    * query, `nprobe` the per-query-token probed-list count. */
  /** `kind = "mrl"`: a [[graft.ann.MrlIndex]] prefix artifact —
    * matryoshka prefix-distance pre-rank + exact rescore via the
    * join-back (`ef` is the rescore pool, like "bq"); the cheapest
    * index to build (a column slice, no training pass). */
  /** `kind = "sparse"`: a [[graft.ops.SparseSearch.writePostings]]
    * term-bucketed inverted file over a sparse struct column
    * (`struct<indices: array<int>, values: array<float>>`), registered
    * under `metric = "sparsedot"` — `ef` is the candidate width of the
    * pruned inverted pre-rank (the rescore above the join-back is the
    * SAME exact score, so results are bit-equal to the exact plan). */
  case class IndexMeta(artifact: String, idCol: String, vecCol: String,
      metric: String, ef: Int, kind: String = "hnsw", nprobe: Int = 0) {
    require(
      Set("hnsw", "ivf", "pq", "ivfpq", "bq", "multivec", "sparse", "mrl")
        .contains(kind),
      s"graft: unknown index kind '$kind'")
    require(nprobe >= 0, s"graft: nprobe must be >= 0, got $nprobe")
    /** Probe count the planner hands an IVF scan. */
    def effectiveNprobe: Int = if (nprobe > 0) nprobe else 8
  }

  private val registry = TrieMap[String, Seq[IndexMeta]]()

  private def normalize(spark: SparkSession, p: String): String = {
    val hp = new Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(hp).toString
  }

  def register(spark: SparkSession, tablePath: String, meta: IndexMeta): Unit = {
    val key = normalize(spark, tablePath)
    registry.updateWith(key) {
      case Some(ms) => Some(ms.filterNot(m =>
        m.vecCol == meta.vecCol && m.metric == meta.metric) :+ meta)
      case None => Some(Seq(meta))
    }
    ()
  }

  def unregister(spark: SparkSession, tablePath: String): Unit =
    registry.remove(normalize(spark, tablePath))

  /** Drop ONE registration — the (vecCol, metric) meta only, sibling
    * registrations of the same table untouched — and return what was
    * removed. The lock granularity the reference gets from PG's
    * per-INDEX locking: a computation that must lift its own index out
    * of the planner's sight (e.g. [[graft.ann.Retune]]'s exact-truth
    * pass) must not also blind or clobber a sibling index a concurrent
    * maintainer is re-registering — `unregister` + snapshot-restore
    * loses that sibling's write. */
  def unregisterOne(spark: SparkSession, tablePath: String, vecCol: String,
      metric: String): Option[IndexMeta] = {
    val key = normalize(spark, tablePath)
    var removed: Option[IndexMeta] = None
    registry.updateWith(key) {
      case Some(ms) =>
        removed = ms.find(m => m.vecCol == vecCol && m.metric == metric)
        val rest = ms.filterNot(m => m.vecCol == vecCol && m.metric == metric)
        if (rest.isEmpty) None else Some(rest)
      case None => None
    }
    removed
  }

  def clear(): Unit = registry.clear()

  def lookup(rootPaths: Seq[Path], vecCol: String, metric: String): Option[IndexMeta] =
    rootPaths.iterator
      .flatMap(p => registry.getOrElse(p.toString, Nil))
      .find(m => m.vecCol == vecCol && m.metric == metric)

  /** The registration for (table, column, metric), by table path — the
    * user-facing lookup [[graft.ann.Retune]] and introspection use
    * (the planner-side [[lookup]] works on already-normalized relation
    * root paths). */
  def metaFor(spark: SparkSession, tablePath: String, vecCol: String,
      metric: String): Option[IndexMeta] =
    registry.getOrElse(normalize(spark, tablePath), Nil)
      .find(m => m.vecCol == vecCol && m.metric == metric)

  def anyFor(rootPaths: Seq[Path]): Boolean =
    rootPaths.exists(p => registry.contains(p.toString))

  /** Every registration of ONE table, by path — lets a caller
    * snapshot-and-restore around a computation that must NOT rewrite
    * (e.g. [[graft.ann.Retune]]'s exact-truth pass for maxsim, whose
    * sort attribute resolves through projections into the rewrite). */
  def metasFor(spark: SparkSession, tablePath: String): Seq[IndexMeta] =
    registry.getOrElse(normalize(spark, tablePath), Nil)

  /** Every registration, (table → meta), deterministically ordered —
    * the enumeration [[graft.ann.Maintain]] sweeps. */
  def entries(): Seq[(String, IndexMeta)] =
    registry.readOnlySnapshot().toSeq.sortBy(_._1).flatMap {
      case (table, ms) =>
        ms.sortBy(m => (m.vecCol, m.metric)).map(table -> _)
    }

  /** Catalog introspection — the analog of the reference's
    * `ldb_get_indexes(tbl)` (lantern_hnsw/test/sql/utils/common.sql:17-42,
    * called from most index tests, e.g. hnsw_create.sql via
    * `SELECT * FROM ldb_get_indexes('sift_base1k')`): one row per
    * registration with the index definition knobs, plus the artifact's
    * on-disk footprint (`files`/`bytes` — the `size` column analog,
    * from one recursive driver-side listing of the artifact directory;
    * registrations are few, artifacts are directories of large files,
    * so the listing is trivially cheap at any data scale) and a
    * human-readable `definition` mirroring the reference's `indexdef`.
    * Pass `table` to restrict to one table's indexes (qualified the
    * way [[register]] qualified it). */
  def describe(spark: SparkSession,
      table: Option[String] = None): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val wanted = table.map(normalize(spark, _))
    val rows = registry.readOnlySnapshot().toSeq
      .filter(e => wanted.forall(_ == e._1))
      .sortBy(_._1)
      .flatMap { case (tbl, metas) =>
        metas.sortBy(m => (m.vecCol, m.metric)).map { m =>
          val p = new Path(m.artifact)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          var files = 0L
          var bytes = 0L
          if (fs.exists(p)) {
            val it = fs.listFiles(p, true)
            while (it.hasNext) { files += 1; bytes += it.next().getLen }
          }
          val definition = s"CREATE INDEX ON $tbl USING ${m.kind} " +
            s"(${m.vecCol} ${m.metric}) WITH (ef=${m.ef}" +
            (if (m.nprobe > 0) s", nprobe=${m.nprobe}" else "") + ")"
          (tbl, m.vecCol, m.idCol, m.metric, m.kind, m.ef, m.nprobe,
            m.artifact, files, bytes, definition)
        }
      }
    rows.toDF("table", "vec_col", "id_col", "metric", "kind", "ef",
      "nprobe", "artifact", "files", "bytes", "definition")
  }

  // ------------------------------------------------- catalog persistence

  /** Persist every registration as one JSON file — the session analog
    * of the reference's index metadata living in the PostgreSQL
    * catalog: a restarted cluster calls [[load]] once and the planner
    * rules see the same indexes without per-table re-registration.
    * Registrations are tiny (strings + ints), so one driver-written
    * file is the right shape at any scale. */
  def save(spark: SparkSession, path: String): Unit = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val lines = registry.readOnlySnapshot().toSeq.sortBy(_._1).flatMap {
      case (table, metas) => metas.map { m =>
        s"""{"table":"${esc(table)}","artifact":"${esc(m.artifact)}",""" +
          s""""idCol":"${esc(m.idCol)}","vecCol":"${esc(m.vecCol)}",""" +
          s""""metric":"${m.metric}","ef":${m.ef},"kind":"${m.kind}",""" +
          s""""nprobe":${m.nprobe}}"""
      }
    }
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Re-register every entry of a [[save]]d catalog file. Table paths
    * were persisted fully qualified, so they go straight into the
    * registry (no re-qualification against the current FS). */
  def load(spark: SparkSession, path: String): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def str(json: String, k: String): String =
      s""""$k":"((?:[^"\\\\]|\\\\.)*)"""".r.findFirstMatchIn(json)
        .getOrElse(throw new IllegalArgumentException(
          s"missing string field '$k'"))
        .group(1).replace("\\\"", "\"").replace("\\\\", "\\")
    def num(json: String, k: String): Int =
      s""""$k":(\\d+)""".r.findFirstMatchIn(json)
        .getOrElse(throw new IllegalArgumentException(
          s"missing numeric field '$k'"))
        .group(1).toInt
    val entries = text.linesIterator.filter(_.trim.nonEmpty).toSeq
    entries.zipWithIndex.foreach { case (line, i) =>
      // a corrupt / truncated / hand-edited entry must name the file
      // and line, not surface as a bare NoSuchElementException
      val meta =
        try IndexMeta(str(line, "artifact"), str(line, "idCol"),
          str(line, "vecCol"), str(line, "metric"), num(line, "ef"),
          str(line, "kind"), num(line, "nprobe"))
        catch { case e: Exception =>
          throw new IllegalArgumentException(
            s"graft: bad catalog entry at $path:${i + 1} " +
              s"(${e.getMessage}): $line", e)
        }
      val key =
        try str(line, "table")
        catch { case e: Exception =>
          throw new IllegalArgumentException(
            s"graft: bad catalog entry at $path:${i + 1} " +
              s"(${e.getMessage}): $line", e)
        }
      registry.updateWith(key) {
        case Some(ms) => Some(ms.filterNot(m =>
          m.vecCol == meta.vecCol && m.metric == meta.metric) :+ meta)
        case None => Some(Seq(meta))
      }
    }
    entries.size
  }
}

/** Logical leaf producing the ANN candidate set (id, vec) for one query.
  * `output` reuses the source relation's attributes so expressions above
  * (the distance sort) keep resolving unchanged.
  */
case class AnnScanLogical(
    idAttr: Attribute,
    vecAttr: Attribute,
    artifact: String,
    query: Seq[Float],
    k: Int,
    ef: Int,
    kind: String = "hnsw",
    nprobe: Int = 0,
    metric: String = "l2sq") extends LeafNode {
  override def output: Seq[Attribute] = Seq(idAttr, vecAttr)
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = 1L + k.toLong * (8 + 4 * query.size))
}

/** Physical ANN scan: one task per graph shard, each emitting its local
  * top-k (id, vec) candidates; ~k·shards rows total — no table scan, no
  * shuffle. The exact `Sort(dist)+Limit` left above it re-ranks the
  * candidates, so results are exact *within* the candidate set
  * (recall-gated, like every HNSW engine).
  */
case class AnnScanExec(
    idAttr: Attribute,
    vecAttr: Attribute,
    artifact: String,
    query: Seq[Float],
    k: Int,
    ef: Int,
    kind: String = "hnsw",
    nprobe: Int = 0,
    metric: String = "l2sq") extends LeafExecNode {

  override def output: Seq[Attribute] = Seq(idAttr, vecAttr)

  override protected def doExecute(): RDD[InternalRow] = kind match {
    case "hnsw" => hnswCandidates()
    case "ivf" =>
      // probed-list scan: ef plays the nprobe role for IVF indexes;
      // output is every row of the probed lists (partition-pruned),
      // re-ranked exactly by the Sort+Limit above
      val (scan, _, _) = graft.ann.IvfIndex.probedScan(
        session, artifact, query.toArray, nprobe = math.max(1, ef))
      scan.selectExpr("id", "vec").queryExecution.toRdd
    case "pq" =>
      // LUT-searched candidate ids, vec NULL: pq never passes
      // storesTrueVectors, so the join-back fetches the TABLE's float
      // rows and the Sort+Limit above is the exact rescore over the
      // top-max(ef,k) LUT pool (stage 1 stays the reference's in-graph
      // asymmetric search, scan.c:75-88; stage 2 the exact re-rank)
      graft.ann.PqAnnIndex.candidateRows(
        session, artifact, query.toArray, k, math.max(ef, k))
    case "ivfpq" =>
      // coarse-list probe + residual-LUT top-ef, emitted as
      // centroid+dequantized reconstructions; exact re-rank above
      graft.ann.IvfPqIndex.candidateRows(
        session, artifact, query.toArray, k, math.max(ef, k),
        math.max(1, nprobe))
    case "bq" =>
      // sign-bit hamming pre-rank over the bits artifact (ef = rescore
      // pool); vec is NULL — bq never passes storesTrueVectors, so the
      // join-back fetches the true floats and the Sort+Limit above IS
      // the exact rescore stage ([[graft.ann.BqIndex]])
      graft.ann.BqIndex.candidateRows(
        session, artifact, query.toArray, math.max(ef, k))
    case "mrl" =>
      // matryoshka prefix pre-rank over the m/dim-sized prefix table
      // (ef = rescore pool); vec NULL like bq — the join-back + the
      // Sort+Limit above are the exact full-dimension rescore
      graft.ann.MrlIndex.candidateRows(
        session, artifact, query.toArray, math.max(ef, k), metric)
  }

  private def hnswCandidates(): RDD[InternalRow] = {
    val spark = session
    val files = {
      val p = new Path(artifact, "graphs")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.getPath.getName.endsWith(".hnsw"))
        .map(_.getPath.toString).sorted.toSeq
    }
    // exact set for small delete counts, distributed-built bloom past
    // the limit — fixed broadcast size at any tombstone volume
    val banned = graft.ann.AnnIndex.tombstoneMask(spark, artifact)
    val sconf = GraftSqlShim.serializableConf(spark.sparkContext.hadoopConfiguration)
    val q = query.toArray
    val kk = k
    val eff = math.max(ef, k)
    val bannedB = spark.sparkContext.broadcast(banned)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("vec", ArrayType(FloatType))))
    spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .mapPartitions { fit =>
        val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(schema)
        fit.flatMap { f =>
          val g = GraphCache.get(f, sconf.value)
          val b = bannedB.value
          g.searchNodes(q, kk, eff, b.banned).iterator.map { case (n, _) =>
            proj(InternalRow(g.label(n),
              org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
                .fromPrimitiveArray(g.vector(n)))).copy()
          }
        }
      }
  }
}

/** Logical leaf producing the top-k candidate IDS of a FILTERED ANN
  * search (`WHERE pred ORDER BY dist LIMIT k`). Unlike [[AnnScanLogical]]
  * the candidate set cannot be fixed at plan time — a selective
  * predicate can starve the limit — so this node defers to
  * [[AnnIndex.searchFiltered]]'s adaptive over-fetch + exact-fallback
  * loop at EXECUTION time. `table` and `pred` are captured plan
  * fragments (not children): the predicate is evaluated by Spark
  * against the original relation inside the widening loop, exactly as
  * the explicit operator does.
  */
case class AnnFilteredIdsLogical(
    candAttr: Attribute,
    table: LogicalPlan,
    pred: Expression,
    idCol: String,
    vecCol: String,
    artifact: String,
    query: Seq[Float],
    k: Int,
    ef: Int,
    kind: String = "hnsw",
    metric: String = "l2sq") extends LeafNode {
  override def output: Seq[Attribute] = Seq(candAttr)
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = 1L + 8L * k)
}

/** Physical filtered-ANN candidate node: runs the adaptive
  * `searchFiltered` loop (index probe → predicate via broadcast join →
  * widen → exact fallback) on the driver when the node is executed —
  * the same place a broadcast exchange materializes its child — and
  * emits the ≤ k winning ids. The join-back above re-fetches full rows;
  * the original Filter + Sort + Limit re-apply, so semantics are exact
  * within the candidate set and the starvation guarantee is
  * searchFiltered's own.
  */
case class AnnFilteredIdsExec(
    candAttr: Attribute,
    // driver-only; @transient keeps the captured relation's
    // (non-serializable) file index out of task closures when the
    // canonicalized join subtree rides along with codegen'd tasks
    @transient table: LogicalPlan,
    pred: Expression,
    idCol: String,
    vecCol: String,
    artifact: String,
    query: Seq[Float],
    k: Int,
    ef: Int,
    kind: String = "hnsw",
    metric: String = "l2sq") extends LeafExecNode {

  override def output: Seq[Attribute] = Seq(candAttr)

  /** Generic adaptive filtered loop for the LUT-candidate kinds:
    * `candFn(pool, nprobe)` proposes nearest-first candidate ids, the
    * predicate's survivors re-rank by the registered metric over the
    * TABLE's true vectors; both widths quadruple per round, with the
    * exact filtered scan as the terminal guarantee (same contract as
    * AnnIndex.searchFiltered / IvfIndex.searchFiltered). */
  private def filteredViaCandidates(
      df: org.apache.spark.sql.DataFrame,
      candFn: (Int, Int) => Array[Long],
      maxRounds: Int = 3): Array[(Long, Double)] = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val spark = df.sparkSession
    import spark.implicits._
    val q = query.toArray
    val predC = GraftSqlShim.column(pred)
    val filtered = df.where(predC)
    val distC = graft.ops.VectorSearch.distance(metric, col(vecCol), lit(q))
    var pool = math.max(4 * k, math.max(ef, 64))
    var nprobe = math.max(ef, 8)
    var round = 0
    while (round < maxRounds) {
      val candDf = candFn(pool, nprobe).toSeq.toDF("__cand_id")
      val surv = filtered
        .join(broadcast(candDf), col(idCol) === col("__cand_id"))
        .select(col(idCol).cast(org.apache.spark.sql.types.LongType),
          distC.as("__d"))
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy(x => (x._2, x._1))
      if (surv.length >= k) return surv.take(k)
      pool *= 4; nprobe *= 4; round += 1
    }
    // exact fallback over the table MINUS the artifact's tombstones —
    // the candidate loop masks deletes in-index, and a fallback
    // without the anti-join would resurrect deleted rows exactly when
    // the predicate starves (AnnIndex.searchFiltered's contract)
    val tomb = new Path(s"$artifact/tombstones")
    val tfs = tomb.getFileSystem(session.sparkContext.hadoopConfiguration)
    val live =
      if (tfs.exists(tomb))
        filtered.join(
          spark.read.parquet(tomb.toString).select(col("id").as("__tomb_id")),
          col(idCol) === col("__tomb_id"), "left_anti")
      else filtered
    live
      .select(col(idCol).cast(org.apache.spark.sql.types.LongType).as("id"),
        distC.as("__d"))
      .orderBy(col("__d"), col("id"))
      .limit(k)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val df = GraftSqlShim.ofRows(session, table)
    // for coarse-list indexes the width param is the probe count
    val hits = kind match {
      case "ivf" =>
        graft.ann.IvfIndex.searchFiltered(df, idCol, vecCol, artifact,
          query.toArray, k, GraftSqlShim.column(pred), nprobeOverride = ef)
      case "pq" =>
        filteredViaCandidates(df, (pool, _) =>
          graft.ann.PqAnnIndex.search(session, artifact, query.toArray,
            pool, math.max(ef, pool)).map(_._1))
      case "ivfpq" =>
        filteredViaCandidates(df, (pool, np) =>
          graft.ann.IvfPqIndex.search(session, artifact, query.toArray,
            pool, nprobe = np, ef = math.max(ef, pool))
            .select("id").collect().map(_.getLong(0)))
      case "bq" =>
        filteredViaCandidates(df, (pool, _) =>
          graft.ann.BqIndex.candidateIds(session, artifact,
            query.toArray, pool))
      case "mrl" =>
        filteredViaCandidates(df, (pool, _) =>
          graft.ann.MrlIndex.candidateIds(session, artifact,
            query.toArray, pool, metric))
      case _ =>
        AnnIndex.searchFiltered(df, idCol, vecCol, artifact,
          query.toArray, k, GraftSqlShim.column(pred), efOverride = ef)
    }
    val schema = StructType(Seq(StructField("id", LongType)))
    sparkContext.parallelize(hits.map(_._1).toSeq, 1).mapPartitions { it =>
      val proj = UnsafeProjection.create(schema)
      it.map(id => proj(InternalRow(id)).copy())
    }
  }
}

/** Logical candidate-id leaf for the WEIGHTED search planner form
  * (`ORDER BY w1·dist(c1,q1) + w2·dist(c2,q2) LIMIT k` — the
  * reference's `weighted_vector_search`,
  * lantern_hnsw/sql/lantern.sql:673-819): each term's index
  * contributes `ef` nearest ids, the union dedupes, and the ORIGINAL
  * Sort+Limit above the join-back re-ranks by the exact joint metric —
  * the reference's CTE UNION ALL + DISTINCT ON(id) shape, exact within
  * the candidate set. */
/** One term of a weighted rewrite: which index proposes this term's
  * candidates and how wide. `ef` is the per-term candidate width; for
  * the coarse-list kinds `nprobe` is the probe count. The query is
  * already kind-adjusted (pq/cos queries pre-normalized, like the
  * scalar form). */
case class WeightedTerm(artifact: String, query: Seq[Float], ef: Int,
    kind: String, nprobe: Int, metric: String)

case class WeightedAnnIdsLogical(
    candAttr: Attribute,
    terms: Seq[WeightedTerm]) extends LeafNode {
  override def output: Seq[Attribute] = Seq(candAttr)
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = 1L + 8L * terms.map(_.ef.toLong).sum)
}

case class WeightedAnnIdsExec(
    candAttr: Attribute,
    terms: Seq[WeightedTerm]) extends LeafExecNode {
  override def output: Seq[Attribute] = Seq(candAttr)

  /** Per-kind nearest-id proposal — each term's candidates come from
    * its OWN index kind's search path (the same proposal functions the
    * scalar forms use), the union dedupes, and the exact joint metric
    * above the join-back re-ranks. */
  private def termIds(t: WeightedTerm): Seq[Long] = {
    import org.apache.spark.sql.functions.{col, lit}
    val q = t.query.toArray
    t.kind match {
      case "ivf" =>
        val (scan, _, _) = graft.ann.IvfIndex.probedScan(
          session, t.artifact, q, nprobe = math.max(1, t.nprobe))
        // cos-IVF lists store unit vectors; cos_dist is normalization-
        // invariant, so ranking the probed rows by the registered
        // metric is sound for both metrics
        scan.select(col("id"),
            graft.ops.VectorSearch.distance(t.metric, col("vec"), lit(q))
              .as("__d"))
          .orderBy(col("__d"), col("id")).limit(t.ef)
          .collect().map(_.getLong(0)).toSeq
      case "pq" =>
        graft.ann.PqAnnIndex.search(session, t.artifact, q, t.ef, t.ef)
          .map(_._1).toSeq
      case "ivfpq" =>
        graft.ann.IvfPqIndex.search(session, t.artifact, q, t.ef,
            nprobe = math.max(1, t.nprobe), ef = t.ef)
          .select("id").collect().map(_.getLong(0)).toSeq
      case "bq" =>
        graft.ann.BqIndex.candidateIds(session, t.artifact, q, t.ef).toSeq
      case "mrl" =>
        graft.ann.MrlIndex.candidateIds(session, t.artifact, q, t.ef,
          t.metric).toSeq
      case _ =>
        AnnIndex.search(session, t.artifact, q, t.ef, t.ef).map(_._1).toSeq
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val ids = terms.flatMap(termIds).distinct
    val schema = StructType(Seq(StructField("id", LongType)))
    sparkContext.parallelize(ids, 1).mapPartitions { it =>
      val proj = UnsafeProjection.create(schema)
      it.map(id => proj(InternalRow(id)).copy())
    }
  }
}

/** Logical candidate-id leaf for the MAXSIM planner form
  * (`ORDER BY maxsim_score(toks, Q) DESC LIMIT k` over a table whose
  * doc-array column carries a `kind = "multivec"` registration): PLAID
  * stage 1 proposes `cand` doc ids, and the ORIGINAL Sort+Limit above
  * the join-back re-scores them with the exact codegen'd MaxSim — the
  * same pre-rank → heap-fetch → exact-rescore shape as the bq form. */
case class MaxSimIdsLogical(
    candAttr: Attribute,
    artifact: String,
    query: Seq[Seq[Float]],
    k: Int,
    cand: Int,
    nprobe: Int,
    // FILTERED form only: the captured relation + predicate + its
    // id/toks columns, so the exec can run the adaptive over-fetch
    // loop (stage-1 candidates are approximate, so a selective
    // predicate can starve the limit — same contract as
    // AnnFilteredIdsExec, with the exact filtered MaxSim scan as the
    // terminal guarantee)
    table: Option[LogicalPlan] = None,
    pred: Option[Expression] = None,
    idCol: String = "",
    vecCol: String = "") extends LeafNode {
  override def output: Seq[Attribute] = Seq(candAttr)
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = 1L + 8L * math.max(cand, k))
}

case class MaxSimIdsExec(
    candAttr: Attribute,
    artifact: String,
    query: Seq[Seq[Float]],
    k: Int,
    cand: Int,
    nprobe: Int,
    // driver-only; @transient for the same reason as the other
    // candidate execs
    @transient table: Option[LogicalPlan] = None,
    pred: Option[Expression] = None,
    idCol: String = "",
    vecCol: String = "") extends LeafExecNode {
  override def output: Seq[Attribute] = Seq(candAttr)

  override protected def doExecute(): RDD[InternalRow] = {
    val qm = query.map(_.toArray).toArray
    val ids: Seq[Long] = pred match {
      case None =>
        // stage 1 reads only (mdoc, cent, tok_i8) from the probed
        // partitions, tombstones masked — the SAME proposal function
        // the library search path uses; the exact rescore happens
        // ABOVE the join-back, on the table's own rows, by the
        // original Sort+Limit
        graft.ops.MultiVec.candidateIdsOnDisk(session, artifact,
          qm, nprobe, cand).toSeq
      case Some(p) =>
        // adaptive over-fetch: the candidate budget quadruples until
        // the predicate's survivors fill k, with the exact filtered
        // MaxSim scan as the terminal guarantee
        import org.apache.spark.sql.functions.{broadcast, col}
        val spark = session
        import spark.implicits._
        val df = GraftSqlShim.ofRows(session, table.get)
        val filtered = df.where(GraftSqlShim.column(p))
        val scoreCol = graft.ops.MultiVec.maxsimCol(col(vecCol), qm)
        var c = math.max(cand, 4 * k)
        var round = 0
        var out: Seq[Long] = null
        var exhausted = false
        while (out == null && !exhausted && round < 3) {
          val cs = graft.ops.MultiVec.candidateIdsOnDisk(session, artifact,
            qm, nprobe, c)
          val surv = filtered
            .join(broadcast(cs.toSeq.toDF("__mvcand")),
              col(idCol) === col("__mvcand"))
            .select(col(idCol).cast(LongType).as("__id"),
              scoreCol.as("__s"))
            .orderBy(col("__s").desc, col("__id"))
            .limit(k)
            .collect().map(_.getLong(0)).toSeq
          if (surv.length >= k) out = surv
          else if (cs.length < c) exhausted = true // pool = whole index
          else { c *= 4; round += 1 }
        }
        if (out != null) out
        else filtered
          .select(col(idCol).cast(LongType).as("__id"), scoreCol.as("__s"))
          .orderBy(col("__s").desc, col("__id"))
          .limit(k)
          .collect().map(_.getLong(0)).toSeq
    }
    val schema = StructType(Seq(StructField("id", LongType)))
    sparkContext.parallelize(ids, 1).mapPartitions { it =>
      val proj = UnsafeProjection.create(schema)
      it.map(id => proj(InternalRow(id)).copy())
    }
  }
}

/** Logical candidate-id leaf for the SPARSE planner form
  * (`ORDER BY sparse_dot(sv, Q) DESC LIMIT k` over a table whose
  * sparse struct column carries a `kind = "sparse"` registration): the
  * bucket-pruned inverted file proposes the exact top-`ef` positive-
  * score ids, and the ORIGINAL Sort+Limit above the join-back
  * re-scores them with the SAME codegen'd SparseDot — so within the
  * candidate set the rewrite is EXACT, not approximate (the inverted
  * fold is bit-identical to the row-wise merge). `table` is a captured
  * fragment for the starvation fallback: when fewer than k docs score
  * > 0, the exact plan fills with zero-overlap rows the postings can't
  * see, so the node falls back to the exact scan rather than alter
  * output. */
case class SparseAnnIdsLogical(
    candAttr: Attribute,
    table: LogicalPlan,
    idCol: String,
    vecCol: String,
    artifact: String,
    qIdx: Seq[Int],
    qVal: Seq[Float],
    k: Int,
    ef: Int,
    pred: Option[Expression] = None) extends LeafNode {
  override def output: Seq[Attribute] = Seq(candAttr)
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = 1L + 8L * math.max(ef, k))
}

case class SparseAnnIdsExec(
    candAttr: Attribute,
    // driver-only (filtered semi-join + starvation fallback);
    // @transient keeps the captured relation (non-serializable file
    // index) out of task closures when the canonicalized join subtree
    // rides along with codegen'd tasks
    @transient table: LogicalPlan,
    idCol: String,
    vecCol: String,
    artifact: String,
    qIdx: Seq[Int],
    qVal: Seq[Float],
    k: Int,
    ef: Int,
    pred: Option[Expression] = None) extends LeafExecNode {
  override def output: Seq[Attribute] = Seq(candAttr)

  override protected def doExecute(): RDD[InternalRow] = {
    import org.apache.spark.sql.functions.col
    val pool = math.max(ef, k)
    // FILTERED form stays exact without any adaptive loop: unlike a
    // graph pre-rank, the inverted file is complete — joining the
    // pruned postings against the predicate's surviving ids BEFORE the
    // fold yields the exact filtered top-k directly (the join is
    // declarative; Spark broadcasts a small survivor set and shuffles
    // a huge one)
    val base = graft.ops.SparseSearch.readPostings(session, artifact, qIdx)
    val post = pred match {
      case Some(p) =>
        val survivors = GraftSqlShim.ofRows(session, table)
          .where(GraftSqlShim.column(p))
          .select(col(idCol))
        base.join(survivors, idCol)
      case None => base
    }
    val hits = graft.ops.SparseSearch.invertedTopK(post, idCol, qIdx, qVal,
        pool)
      .select(col(idCol).cast(LongType))
      .collect().map(_.getLong(0))
    val ids =
      if (hits.length >= k) hits.toSeq
      else {
        // positive-score starvation: the exact plan ranks zero-overlap
        // docs (score 0) after the matches — those rows never enter the
        // postings join, so fill from the exact scan over the table
        // (predicate re-applied), masking tombstoned ids so a deleted
        // doc can't resurface through the fallback that the pruned
        // path correctly hides
        val raw = GraftSqlShim.ofRows(session, table)
        val df = graft.ops.SparseSearch.maskTombstones(
          pred.map(p => raw.where(GraftSqlShim.column(p))).getOrElse(raw),
          artifact, idCol)
        df.select(col(idCol).cast(LongType).as("__id"),
            graft.functions.sparse_dot(col(vecCol),
              graft.ops.SparseSearch.queryLit(qIdx, qVal)).as("__s"))
          .orderBy(col("__s").desc, col("__id"))
          .limit(k)
          .collect().map(_.getLong(0)).toSeq
      }
    val schema = StructType(Seq(StructField("id", LongType)))
    sparkContext.parallelize(ids, 1).mapPartitions { it =>
      val proj = UnsafeProjection.create(schema)
      it.map(id => proj(InternalRow(id)).copy())
    }
  }
}

/** Logical per-outer-row kNN join — what a correlated LATERAL
  * `(SELECT id FROM t ORDER BY dist(vec, outer.qvec) LIMIT k)` means.
  * Vanilla Spark REJECTS that SQL outright
  * (UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY.CORRELATED_REFERENCE: no
  * outer references under ORDER BY), so [[AnnLateralKnnRule]] rewrites
  * it during analysis, before CheckAnalysis would fail — the engine
  * ADDS the lateral form the reference tests
  * (lantern_hnsw/test/sql/hnsw_select.sql:66-69). Output is the left
  * row stream with the subquery's id column appended (`outAttr`, the
  * inner relation's id attribute, declared via `producedAttributes`).
  */
case class AnnKnnJoinLogical(
    child: LogicalPlan,
    queryAttr: Attribute,
    outAttr: Attribute,
    artifact: String,
    k: Int,
    ef: Int,
    metric: String,
    kind: String = "hnsw",
    nprobe: Int = 0,
    // ivfpq only: the indexed table (captured fragment, not a child) +
    // its id/vec columns, so the exec can exact-rerank the LUT pool
    // against the TABLE's true floats (the codes-only index never
    // stores them)
    table: Option[LogicalPlan] = None,
    idCol: String = "",
    vecCol: String = "") extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override protected def withNewChildInternal(c: LogicalPlan): AnnKnnJoinLogical =
    copy(child = c)
}

/** Physical batched kNN join: the outer side's query vectors collect on
  * the driver (byte-budget-gated — probe sides are small by the kNN-join
  * contract; bigger ones must use `AnnIndex.searchMany` /
  * `VectorSearch.knnJoin*` directly), broadcast ONCE to the index
  * shards, and every shard answers every query in a single pass
  * ([[AnnIndex.searchMany]]) — index-side I/O independent of the query
  * count, no per-row index scans. Rows with a NULL query vector join to
  * nothing (inner-join semantics for an unanswerable probe).
  */
case class AnnKnnJoinExec(
    queryAttr: Attribute,
    outAttr: Attribute,
    artifact: String,
    k: Int,
    ef: Int,
    metric: String,
    kind: String,
    nprobe: Int,
    // driver-only rescore source; @transient for the same reason as
    // AnnFilteredIdsExec.table
    @transient table: Option[LogicalPlan],
    idCol: String,
    vecCol: String,
    child: SparkPlan) extends org.apache.spark.sql.execution.UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override protected def withNewChildInternal(c: SparkPlan): AnnKnnJoinExec =
    copy(child = c)

  /** The bq artifact's invariant parts, read ONCE per exec — the
    * distributed path calls [[searchManyFor]] once per budget chunk,
    * and re-reading the center parquet / re-deriving the tombstone
    * anti-join every chunk would be N redundant driver round-trips. */
  private lazy val bqArtifact
      : (org.apache.spark.sql.DataFrame, Array[Float]) =
    (graft.ann.BqIndex.liveBits(session, artifact),
      graft.ann.BqIndex.center(session, artifact))

  /** Token dim of a multivec artifact — from its persisted centroids;
    * used to reshape the flattened probe matrices back to token rows. */
  private lazy val mvTokDim: Int =
    graft.ops.MultiVec.loadCentroids(session, artifact).head.length

  /** One batched per-kind search, all kinds sharing searchMany's output
    * contract (query_id, neighbor_id, dist, rank). */
  private def searchManyFor(
      queries: Seq[(Long, Array[Float])]): org.apache.spark.sql.DataFrame =
    kind match {
      case "sparse" =>
        // probes were flattened (count, indices, values) triples
        // ([[AnnKnnJoinExec.pack]]); the batched inverted fold is
        // EXACT, so no rescore pool is involved — one pruned postings
        // pass answers every probe
        val qs = queries.flatMap { case (qid, flat) =>
          val n = if (flat.isEmpty) 0 else flat(0).toInt
          if (n == 0) None // empty sparse probe matches nothing
          else Some((qid,
            (0 until n).map(i => flat(1 + i).toInt),
            (0 until n).map(i => flat(1 + n + i))))
        }
        if (qs.isEmpty) {
          import session.implicits._
          Seq.empty[(Long, Long, Double, Int)]
            .toDF("query_id", "neighbor_id", "score", "rank")
        } else graft.ops.SparseSearch.searchManyOnDisk(
          session, artifact, qs, k)
      case "multivec" =>
        // probes were flattened token matrices ([[packQuery]]); reshape
        // with the artifact's token dim and run ONE batched PLAID pass.
        // An empty probe side (or all-NULL probes) joins to nothing —
        // same unanswerable-probe semantics as every other kind
        if (queries.isEmpty) {
          import session.implicits._
          Seq.empty[(Long, Long, Double, Int)]
            .toDF("query_id", "neighbor_id", "dist", "rank")
        } else {
          val dim = mvTokDim
          val mats = queries.map { case (qid, flat) =>
            require(flat.length % dim == 0,
              s"graft: probe matrix for query $qid has ${flat.length} floats, " +
                s"not a multiple of token dim $dim")
            (qid, flat.grouped(dim).toArray)
          }
          graft.ops.MultiVec.searchManyOnDisk(session, artifact, mats, k,
            nprobe = math.max(1, nprobe), candPerQuery = math.max(ef, k))
        }
      case "ivf" =>
        graft.ann.IvfIndex.searchMany(session, artifact, queries, k,
          nprobe = math.max(1, nprobe))
      case "ivfpq" =>
        val rr = table.map(t => (GraftSqlShim.ofRows(session, t), idCol, vecCol))
        graft.ann.IvfPqIndex.searchMany(session, artifact, queries, k,
          nprobe = math.max(1, nprobe), ef = ef, rerank = rr)
      case "pq" =>
        val rr = table.map(t => (GraftSqlShim.ofRows(session, t), idCol, vecCol))
        graft.ann.PqAnnIndex.searchMany(session, artifact, queries, k,
          ef = ef, rerank = rr, metric = metric)
      case "bq" =>
        // batched BQ rescore: hamming pre-rank over the bits artifact
        // (pool = ef), exact rerank against the TABLE's float rows —
        // the floats come from the relation the rule captured, so the
        // artifact stays signature-only
        val t = GraftSqlShim.ofRows(session, table.get)
        import org.apache.spark.sql.functions.col
        val (bits, center) = bqArtifact
        graft.ops.BqSearch.topKManyPrepacked(
          bits, "id", "bits",
          t.select(col(idCol).cast("long").as("id"), col(vecCol)), vecCol,
          queries, k, pool = math.max(ef, k), metric = metric,
          center = center)
      case "mrl" =>
        // batched matryoshka rescore: prefix pre-rank over the m/dim
        // prefix table, exact full-dim rerank against the captured
        // relation's float rows (MrlSearch's prepacked path)
        val t = GraftSqlShim.ofRows(session, table.get)
        import org.apache.spark.sql.functions.col
        graft.ops.MrlSearch.topKManyPrepacked(
          graft.ann.MrlIndex.livePrefixes(session, artifact), "id", "pref",
          t.select(col(idCol).cast("long").as("id"), col(vecCol)), vecCol,
          queries, k, pool = math.max(ef, k),
          m = graft.ann.MrlIndex.m(session, artifact), metric = metric)
      case _ =>
        AnnIndex.searchMany(session, artifact, queries, k, ef)
    }

  /** Probe extraction per kind: hamming probes are the table's
    * b1-packed array<int> (repacked to the shards' word floats);
    * multivec probes are token MATRICES (array<array<float>>),
    * flattened and reshaped by [[searchManyFor]] with the artifact's
    * token dim; sparse probes are (indices, values) STRUCTS, flattened
    * as (count, indices-as-floats, values); float vectors pass
    * through. Null probe → null (joins to nothing). */
  private def packQuery(r: InternalRow, qIdx: Int): Array[Float] =
    AnnKnnJoinExec.packProbe(r, qIdx, kind, metric)

  /** Probe payload bytes for the ingest budget — nested matrices and
    * sparse structs count their actual floats, not just the outer
    * element count. */
  private def probeBytes(r: InternalRow, qIdx: Int): Long =
    if (r.isNullAt(qIdx)) 0L
    else if (kind == "sparse") {
      val st = r.getStruct(qIdx, 2)
      val ia = st.getArray(0)
      4L * (1 + 2 * (if (ia == null) 0 else ia.numElements()))
    } else if (kind == "multivec") {
      val a = r.getArray(qIdx)
      var b = 0L; var i = 0
      while (i < a.numElements()) {
        val inner = a.getArray(i)
        b += 4L * (if (inner == null) 0 else inner.numElements()) + 8L
        i += 1
      }
      b
    } else 4L * r.getArray(qIdx).numElements()

  override protected def doExecute(): RDD[InternalRow] = {
    val qIdx = child.output.indexWhere(_.exprId == queryAttr.exprId)
    val budget = graft.GraftConf.knnJoinBroadcastBytes(session)
    // collect INCREMENTALLY (partition-at-a-time iterator) with a
    // running byte estimate: an UNDER-budget probe side takes the
    // broadcast fast path (one searchMany, map-side fanout); the moment
    // the estimate exceeds the budget, draining stops and the exec
    // auto-routes to the distributed chunked path instead — the driver
    // never holds more than the budget either way
    val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var bytes = 0L
    var overBudget = false
    val it = child.executeToIterator()
    while (!overBudget && it.hasNext) {
      val r = it.next().copy()
      bytes += probeBytes(r, qIdx) + 16L
      if (bytes > budget) overBudget = true
      else buf += r
    }
    if (overBudget) {
      buf.clear()
      return distributedJoin(qIdx, budget)
    }
    val rows = buf.toArray
    val queries = rows.iterator.zipWithIndex
      .filterNot { case (r, _) => r.isNullAt(qIdx) }
      .map { case (r, i) => (i.toLong, packQuery(r, qIdx)) }
      .toSeq
    val resultDf = searchManyFor(queries)
    val byQ = resultDf
      .select("query_id", "neighbor_id", "rank")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1))).toMap
    val schema = StructType(output.map(a =>
      StructField(a.name, a.dataType, a.nullable)))
    val types = child.output.map(_.dataType)
    // expand the k-fanout DISTRIBUTIVELY: driver residency stays at the
    // ingest budget (probe rows) + the neighbor-id map (≤ probes·k
    // longs); the probe×k joined rows are built map-side from the
    // broadcast result map, never materialized on the driver.
    // Broadcast lifetimes: searchMany's internal query/tombstone
    // broadcasts are unreferenced once the collect above returns, and
    // byQB once the result RDD is dropped — both reclaimed by Spark's
    // ContextCleaner (destroy()ing byQB here would break the RDD);
    // the distributed path instead materializes each chunk eagerly so
    // its broadcasts never accumulate across chunks
    val byQB = sparkContext.broadcast(byQ)
    val nParts = math.max(1, math.min(rows.length,
      sparkContext.defaultParallelism))
    sparkContext.parallelize(rows.toSeq.zipWithIndex, nParts)
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(schema)
        val m = byQB.value
        it.flatMap { case (r, i) =>
          m.getOrElse(i.toLong, Array.empty[Long]).iterator.map { nid =>
            proj(InternalRow.fromSeq(
              types.indices.map(j => r.get(j, types(j))) :+ nid)).copy()
          }
        }
      }
  }

  /** Distributed path for over-budget probe sides: the probe rows
    * STAY on the cluster (persisted with stable zipWithIndex ids), only
    * the (id, query-vector) pairs stream through the driver one
    * partition at a time, grouped into budget-sized chunks — each chunk
    * is one batched `searchManyFor` pass over the index, so driver
    * residency is bounded by the budget at every moment. The per-chunk
    * neighbor DataFrames stay lazy; their union RDD-joins back to the
    * persisted probe rows on the probe id (an ordinary shuffle join —
    * the probe×k fanout is built reduce-side, never on the driver). */
  private def distributedJoin(qIdx: Int, budget: Long): RDD[InternalRow] = {
    import org.apache.spark.storage.StorageLevel
    // persist BEFORE zipWithIndex: zipWithIndex eagerly runs a count
    // job over its parent, so an un-persisted parent would compute the
    // (deliberately large) probe subtree one extra full time just to
    // number it. The zipped view itself needs no second persist — its
    // partition offsets are computed once at construction, and re-
    // deriving it from the cached rows is a map.
    val rows = child.execute()
      .mapPartitions(_.map(_.copy()))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val probes = rows
      .zipWithIndex()
      .map { case (r, i) => (i, r) }
    // executor-side packing goes through the STATIC helper with local
    // flags: an instance-method call would drag the whole exec node
    // (and its captured, non-serializable relation) into the closure
    val kindL = kind
    val metricL = metric
    val vecs = probes.mapPartitions(_.map { case (pid, r) =>
      (pid, AnnKnnJoinExec.packProbe(r, qIdx, kindL, metricL))
    })
    val chunkResults = scala.collection.mutable.ArrayBuffer
      .empty[RDD[(Long, Long)]]
    val chunk = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    var bytes = 0L
    def flush(): Unit = if (chunk.nonEmpty) {
      // materialize the chunk's neighbors NOW (≤ chunk-queries × k id
      // pairs, cached executor-side): once the job ran, the chunk's
      // internal query broadcast is unreferenced and the ContextCleaner
      // reclaims it — lazy chunks would instead accumulate every
      // chunk's broadcast until the final join executed
      val r = searchManyFor(chunk.toSeq)
        .select("query_id", "neighbor_id").rdd
        .map(r => (r.getLong(0), r.getLong(1)))
        .persist(StorageLevel.MEMORY_AND_DISK)
      r.count()
      chunkResults += r
      chunk.clear()
      bytes = 0L
    }
    vecs.toLocalIterator.foreach { case (pid, v) =>
      if (v != null) {
        chunk += ((pid, v))
        bytes += 4L * v.length + 16L
        if (bytes > budget) flush()
      }
    }
    flush()
    val neighbors: RDD[(Long, Long)] = chunkResults
      .reduceOption(_ union _)
      .getOrElse(sparkContext.emptyRDD[(Long, Long)])
    val schema = StructType(output.map(a =>
      StructField(a.name, a.dataType, a.nullable)))
    val types = child.output.map(_.dataType)
    probes.join(neighbors)
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(schema)
        it.map { case (_, (r, nid)) =>
          proj(InternalRow.fromSeq(
            types.indices.map(j => r.get(j, types(j))) :+ nid)).copy()
        }
      }
  }
}

object AnnKnnJoinExec {
  /** Row-level probe packing, executor-safe (a static call captures no
    * plan node). Sparse probes are STRUCTS — flattened as (count,
    * indices-as-floats, values); exact because term indices are ints
    * below 2^24 (any real vocabulary). Everything else is array-typed
    * and routes through [[pack]]. */
  def packProbe(r: InternalRow, qIdx: Int, kind: String,
      metric: String): Array[Float] =
    if (r.isNullAt(qIdx)) null
    else if (kind == "sparse") {
      val st = r.getStruct(qIdx, 2)
      val ia = st.getArray(0)
      val va = st.getArray(1)
      // a struct with null inner arrays is as unanswerable as a null
      // probe — joins to nothing, same as the documented null-probe
      // semantics (probeBytes already counts it as 0 bytes)
      if (ia == null || va == null) return null
      val n = ia.numElements()
      require(va.numElements() == n,
        s"graft: sparse probe indices/values length mismatch: " +
          s"$n vs ${va.numElements()}")
      val out = new Array[Float](1 + 2 * n)
      out(0) = n.toFloat
      var i = 0
      while (i < n) {
        val t = ia.getInt(i)
        require(t >= 0 && t < (1 << 24),
          s"graft: sparse probe term $t outside the exact float range")
        out(1 + i) = t.toFloat
        out(1 + n + i) = va.getFloat(i)
        i += 1
      }
      out
    } else pack(r.getArray(qIdx), metric == "hamming", kind == "multivec")

  /** Probe packing, executor-safe (a static call captures no plan
    * node): hamming probes repack b1 ints to word floats; multivec
    * token matrices flatten row-major (reshaped at search time with
    * the artifact's token dim); float vectors pass through. */
  def pack(a: ArrayData, hamming: Boolean, multivec: Boolean): Array[Float] =
    if (hamming) Metric.b1ToWords(a.toIntArray())
    else if (multivec) {
      val n = a.numElements()
      val parts = new Array[Array[Float]](n)
      var total = 0
      var i = 0
      while (i < n) {
        val inner = a.getArray(i)
        require(inner != null,
          s"graft: multivec probe has a null token row at position $i")
        parts(i) = inner.toFloatArray(); total += parts(i).length
        i += 1
      }
      val out = new Array[Float](total)
      var off = 0
      i = 0
      while (i < n) {
        System.arraycopy(parts(i), 0, out, off, parts(i).length)
        off += parts(i).length; i += 1
      }
      out
    } else a.toFloatArray()

  /** The kinds whose rescore needs the captured relation (their
    * artifacts store codes/bits/prefixes, never the true floats). */
  private[plans] val TableKinds = Set("ivfpq", "pq", "bq", "mrl")
}

object AnnStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AnnScanLogical(id, vec, artifact, q, k, ef, kind, nprobe, metric) =>
      AnnScanExec(id, vec, artifact, q, k, ef, kind, nprobe, metric) :: Nil
    case AnnFilteredIdsLogical(cid, table, pred, idCol, vecCol, artifact, q, k, ef, kind, metric) =>
      AnnFilteredIdsExec(cid, table, pred, idCol, vecCol, artifact, q, k, ef, kind, metric) :: Nil
    case AnnKnnJoinLogical(left, qAttr, outAttr, artifact, k, ef, metric,
        kind, nprobe, table, idCol, vecCol) =>
      AnnKnnJoinExec(qAttr, outAttr, artifact, k, ef, metric,
        kind, nprobe, table, idCol, vecCol, planLater(left)) :: Nil
    case WeightedAnnIdsLogical(cid, terms) =>
      WeightedAnnIdsExec(cid, terms) :: Nil
    case MaxSimIdsLogical(cid, artifact, q, k, cand, nprobe, table, pred, idCol, vecCol) =>
      MaxSimIdsExec(cid, artifact, q, k, cand, nprobe, table, pred, idCol, vecCol) :: Nil
    case SparseAnnIdsLogical(cid, table, idCol, vecCol, artifact, qi, qv, k, ef, pred) =>
      SparseAnnIdsExec(cid, table, idCol, vecCol, artifact, qi, qv, k, ef, pred) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: `GlobalLimit(k, Sort(dist(vecCol, literal)))` over a
  * relation registered in [[AnnCatalog]] → ANN candidate scan.
  *
  * Two rewrite forms (reference lifecycle §3.1 in SURVEY.md):
  *  - plan only needs (id, vec): relation replaced outright — zero table
  *    scan, the 100 TB win;
  *  - plan needs more columns: candidates inner-joined back to the
  *    relation on id (broadcast — k·P rows), the heap-fetch-by-TID analog.
  *
  * The rule ALSO fires through a Filter (`WHERE pred ORDER BY dist
  * LIMIT k` — the reference keeps the index under a WHERE and
  * post-filters, scan.c:332-333, asserted by
  * test/sql/hnsw_select.sql:52-53): the Filter subtree is rewritten to
  * a join-back against [[AnnFilteredIdsLogical]], whose execution runs
  * `AnnIndex.searchFiltered`'s adaptive over-fetch with the EXACT
  * filtered scan as fallback — so Spark's filter-then-top-k semantics
  * hold even when the predicate starves the limit. Fires for hnsw
  * non-hamming and ivf indexes (ivf routes to
  * `IvfIndex.searchFiltered`, probe-count widening) with a
  * deterministic single-table predicate;
  * anything else keeps the exact `TakeOrderedAndProject`, as in the
  * reference where the cost model returns ∞ (hnsw.c:164-172).
  */
class AnnRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Runtime search width: the session GUC (`SET spark.graft.ann.ef`,
    * the reference's `SET lantern_hnsw.ef` — runtime-tunable per
    * options.h:44-45) overrides the registration-time default. */
  private def efRuntime(meta: AnnCatalog.IndexMeta): Int = {
    val c = graft.GraftConf.annEf(spark)
    if (c > 0) c else meta.ef
  }

  /** Runtime coarse-probe width (`SET spark.graft.ann.nprobe`) for the
    * ivf/ivfpq forms — the nprobe counterpart of [[efRuntime]]. */
  private def nprobeRuntime(meta: AnnCatalog.IndexMeta): Int = {
    val c = graft.GraftConf.annNprobe(spark)
    if (c > 0) c else meta.effectiveNprobe
  }

  /** (metric, vecAttr, query) from a distance sort expression. */
  private def matchDist(e: Expression): Option[(String, AttributeReference, Array[Float])] = {
    def vec(l: Literal): Array[Float] =
      l.value.asInstanceOf[ArrayData].toFloatArray()
    e match {
      case L2SqDist(a: AttributeReference, l: Literal) => Some(("l2sq", a, vec(l)))
      case L2SqDist(l: Literal, a: AttributeReference) => Some(("l2sq", a, vec(l)))
      case CosDist(a: AttributeReference, l: Literal) => Some(("cos", a, vec(l)))
      case CosDist(l: Literal, a: AttributeReference) => Some(("cos", a, vec(l)))
      case UnaryMinus(InnerProduct(a: AttributeReference, l: Literal), _) =>
        Some(("inner", a, vec(l)))
      case UnaryMinus(InnerProduct(l: Literal, a: AttributeReference), _) =>
        Some(("inner", a, vec(l)))
      // hamming sorts on a b1-packed array<int> column; the index holds
      // 16-bit word floats, so the query literal is word-packed here
      case HammingDist(a: AttributeReference, l: Literal) =>
        Some(("hamming", a, bits(l)))
      case HammingDist(l: Literal, a: AttributeReference) =>
        Some(("hamming", a, bits(l)))
      case _ => None
    }
  }

  private def bits(l: Literal): Array[Float] =
    Metric.b1ToWords(l.value.asInstanceOf[ArrayData].toIntArray())

  /** (sparseAttr, query indices, query values) from a
    * `sparse_dot(column, literal-struct)` sort expression. By this
    * rule's run ConstantFolding has collapsed
    * `struct(typedlit(idx), typedlit(vals))` into one struct Literal;
    * an unfolded CreateNamedStruct of literals is matched too. */
  private def matchSparse(e: Expression)
      : Option[(AttributeReference, Seq[Int], Seq[Float])] = {
    def isSparseType(t: DataType): Boolean = t match {
      case StructType(Array(f0, f1)) =>
        (f0.dataType, f1.dataType) match {
          case (ArrayType(IntegerType, _), ArrayType(FloatType, _)) => true
          case _ => false
        }
      case _ => false
    }
    def query(q: Expression): Option[(Seq[Int], Seq[Float])] = q match {
      case Literal(row: InternalRow, t) if isSparseType(t) =>
        Some((row.getArray(0).toIntArray().toSeq,
          row.getArray(1).toFloatArray().toSeq))
      case cns: CreateNamedStruct if cns.foldable && isSparseType(cns.dataType) =>
        query(Literal.create(cns.eval(InternalRow.empty), cns.dataType))
      case _ => None
    }
    e match {
      case graft.functions.SparseDot(a: AttributeReference, q) =>
        query(q).map { case (i, v) => (a, i, v) }
      case graft.functions.SparseDot(q, a: AttributeReference) =>
        query(q).map { case (i, v) => (a, i, v) }
      case _ => None
    }
  }

  /** Decompose `w1·dist(c1,q1) + w2·dist(c2,q2) + …` — the
    * `weighted_vector_search` sort form (sql/lantern.sql:673-819).
    * Bare dist terms weigh 1.0. Weights must be positive literals: a
    * negative weight inverts its term's ordering, so a union of
    * per-term NEAREST candidates would be biased exactly wrong. */
  private def matchWeighted(e: Expression)
      : Option[Seq[(Double, String, AttributeReference, Array[Float])]] = {
    def flat(x: Expression): Seq[Expression] = x match {
      case Add(l, r, _) => flat(l) ++ flat(r)
      case other => Seq(other)
    }
    def num(l: Literal): Option[Double] = l.value match {
      case d: java.lang.Double => Some(d)
      case f: java.lang.Float => Some(f.toDouble)
      case i: java.lang.Integer => Some(i.toDouble)
      case n: java.lang.Long => Some(n.toDouble)
      case _ => None
    }
    def term(x: Expression): Option[(Double, String, AttributeReference, Array[Float])] =
      x match {
        case Multiply(l: Literal, d, _) =>
          for { w <- num(l); (m, a, q) <- matchDist(d) } yield (w, m, a, q)
        case Multiply(d, l: Literal, _) =>
          for { w <- num(l); (m, a, q) <- matchDist(d) } yield (w, m, a, q)
        case d => matchDist(d).map { case (m, a, q) => (1.0, m, a, q) }
      }
    val ts = flat(e).map(term)
    if (ts.size >= 2 && ts.forall(_.isDefined)) Some(ts.map(_.get)) else None
  }

  /** True iff `p` is the reference's `max_dist` filter for exactly the
    * weighted sort `terms`: the SAME joint expression compared
    * `< / <=` a literal, modulo optimizer-inferred IsNotNull conjuncts
    * (InferFiltersFromConstraints adds those above vector columns).
    */
  private def isMaxDistPred(
      p: Expression,
      terms: Seq[(Double, String, AttributeReference, Array[Float])],
      child: LogicalPlan): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def sameTerms(e: Expression): Boolean =
      matchWeighted(resolveThroughProject(e, child)).exists { ts =>
        ts.size == terms.size && ts.zip(terms).forall {
          case ((w1, m1, a1, q1), (w2, m2, a2, q2)) =>
            w1 == w2 && m1 == m2 && a1.exprId == a2.exprId && q1.sameElements(q2)
        }
      }
    val (notNulls, rest) = conjuncts(p).partition {
      case IsNotNull(_) => true
      case _ => false
    }
    notNulls.forall(_.references.subsetOf(AttributeSet(terms.map(_._3)))) &&
      (rest match {
        case Seq(LessThan(e, _: Literal)) => sameTerms(e)
        case Seq(LessThanOrEqual(e, _: Literal)) => sameTerms(e)
        case Seq(GreaterThan(_: Literal, e)) => sameTerms(e)
        case Seq(GreaterThanOrEqual(_: Literal, e)) => sameTerms(e)
        case _ => false
      })
  }

  /** Reassemble the rewritten subtree shared by every scalar form:
    * splice `newSource` (the candidate join-back) where the relation
    * leaf sat — keeping every Project and the Filter intact when a
    * predicate was captured, so the output schema and
    * filter-then-top-k semantics are unchanged — and rebuild
    * Sort/Project/Limit above it. */
  private def rebuilt(gl: GlobalLimit, ll: LocalLimit, sortNode: Sort,
      projAbove: Option[Project], child: LogicalPlan,
      rel: LogicalRelation, newSource: LogicalPlan,
      hasPred: Boolean): LogicalPlan = {
    val newChild =
      if (hasPred) {
        def splice(p: LogicalPlan): LogicalPlan = p match {
          case lr: LogicalRelation if lr eq rel => newSource
          case pr: Project => pr.copy(child = splice(pr.child))
          case f: Filter => f.copy(child = splice(f.child))
          case other => other
        }
        splice(child)
      } else child match {
        case p: Project => p.copy(child = newSource)
        case _ => newSource
      }
    val newSort = sortNode.copy(child = newChild)
    val newBody = projAbove
      .map(p => p.copy(child = newSort): LogicalPlan).getOrElse(newSort)
    gl.copy(child = ll.copy(child = newBody))
  }

  /** Evaluate a FOLDABLE `array<array<float>>` token-matrix literal to
    * the driver-side matrix the scalar maxsim rewrite carries. Declines
    * (None) on null/empty rows — the exact plan stays, never a crash. */
  private def foldTokMatrix(e: Expression): Option[Array[Array[Double]]] = {
    val v = e.eval()
    if (v == null) None
    else {
      val ad = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = ad.numElements()
      if (n == 0) None
      else {
        val out = new Array[Array[Double]](n)
        var i = 0
        while (i < n) {
          if (ad.isNullAt(i)) return None
          val row = ad.getArray(i)
          val m = row.numElements()
          if (m == 0) return None
          val r = new Array[Double](m)
          var j = 0
          while (j < m) {
            if (row.isNullAt(j)) return None
            r(j) = row.getFloat(j).toDouble
            j += 1
          }
          out(i) = r
          i += 1
        }
        Some(out)
      }
    }
  }

  /** Resolve a sort expression through one Project level of aliases. */
  private def resolveThroughProject(e: Expression, child: LogicalPlan): Expression =
    child match {
      case Project(projList, _) =>
        val aliases = projList.collect { case a: Alias => a.exprId -> a.child }.toMap
        e.transformUp {
          case ar: AttributeReference if aliases.contains(ar.exprId) => aliases(ar.exprId)
        }
      case _ => e
    }

  private def findRelation(plan: LogicalPlan)
      : Option[(LogicalRelation, Seq[Path])] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation if AnnCatalog.anyFor(fs.location.rootPaths) =>
        Some((lr, fs.location.rootPaths))
      case _ => None
    }
    case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      findRelation(child)
    case _ => None
  }

  /** Like [[findRelation]] but also looks through at most one Filter
    * (stacked Filters are combined by the optimizer before this rule
    * runs), returning its condition when present. */
  private def findFilteredRelation(plan: LogicalPlan)
      : Option[(Option[Expression], LogicalRelation, Seq[Path])] = plan match {
    case Filter(cond, fchild) =>
      findRelation(fchild).map { case (rel, paths) => (Some(cond), rel, paths) }
    case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      findFilteredRelation(child)
    case _ => findRelation(plan).map { case (rel, paths) => (None, rel, paths) }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case gl @ GlobalLimit(IntegerLiteral(k), ll @ LocalLimit(_, body))
        if k > 0 && k <= 1000 =>
      // column pruning may leave a Project between the limit and the sort
      val (projAbove, sortOpt) = body match {
        case p @ Project(_, s: Sort) => (Some(p), Some(s))
        case s: Sort => (None, Some(s))
        case _ => (None, None)
      }
      val rewritten = for {
        s @ Sort(Seq(SortOrder(sortExpr, Ascending, _, _)), true, child, _) <- sortOpt
        (predOpt, rel, paths) <- findFilteredRelation(child)
        (metric, vecAttr, q) <- matchDist(resolveThroughProject(sortExpr, child))
        meta <- AnnCatalog.lookup(paths, vecAttr.name, metric)
        // registration metadata is an unchecked user claim: a hamming
        // registration only has a real artifact behind it as hnsw
        // (builds reject the rest — scoring word floats as l2sq would
        // be silently wrong, same guard as the lateral rule), and a bq
        // artifact pre-ranks sign bits of FLOAT vectors, meaningful
        // for the l2/angular family only
        if meta.metric != "hamming" || meta.kind == "hnsw"
        if !Set("bq", "mrl")(meta.kind) || Set("l2sq", "cos")(meta.metric)
        idAttr <- rel.output.find(_.name == meta.idCol)
        // the filtered form defers to searchFiltered, which needs an
        // hnsw graph artifact, an exact-rankable metric, and a
        // predicate Spark can evaluate against the table alone
        // filtered-form kind/metric support: hnsw + ivf fully; pq,
        // ivfpq and bq rerank via l2sq-on-(unit)vectors, sound for
        // l2sq and cos ordering but not inner
        if predOpt.forall(p =>
          ((meta.kind == "hnsw" && meta.metric != "hamming") ||
            meta.kind == "ivf" ||
            (meta.kind == "pq" && Set("l2sq", "cos")(meta.metric)) ||
            (meta.kind == "ivfpq" && Set("l2sq", "cos")(meta.metric)) ||
            (meta.kind == "bq" && Set("l2sq", "cos")(meta.metric)) ||
            (meta.kind == "mrl" && Set("l2sq", "cos")(meta.metric))) &&
            p.deterministic && p.references.subsetOf(rel.outputSet))
      } yield {
        // a cos PQ index is an l2sq graph over unit vectors — the
        // query normalizes HERE so the exec's LUT measures the
        // cosine-equivalent geometry (cos_dist itself is query-scale
        // invariant, so the exact re-rank is unaffected)
        val qq =
          if (meta.kind == "pq") Metric.normalizeIfCos(q, meta.metric) else q
        // ef drives graph/LUT search width; IVF instead takes a probe
        // count (ef would degenerate to probing every list — see
        // IndexMeta.nprobe). IVF-PQ needs BOTH: ef as the residual-LUT
        // candidate-pool width plus its own coarse probe count.
        val searchParam =
          if (meta.kind == "ivf") nprobeRuntime(meta)
          else math.max(efRuntime(meta), k)
        val scanNprobe =
          if (meta.kind == "ivfpq") nprobeRuntime(meta) else 0
        val newSource: LogicalPlan = predOpt match {
          case Some(pred) =>
            // filtered form: ids from the adaptive over-fetch + exact
            // fallback loop, then heap-fetch join-back; the original
            // Filter stays above and re-applies pred over ≤ k rows
            val cid = AttributeReference("__graft_cand_id", LongType)()
            val ids = AnnFilteredIdsLogical(cid, rel, pred, meta.idCol,
              meta.vecCol, meta.artifact, qq.toSeq, k, searchParam, meta.kind,
              meta.metric)
            Project(rel.output,
              Join(rel, ids, Inner, Some(EqualTo(idAttr, cid)),
                JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST))))))
          case None =>
            val ann = AnnScanLogical(
              idAttr, vecAttr, meta.artifact, qq.toSeq, k,
              searchParam, meta.kind, scanNprobe, meta.metric)
            // narrow form is safe only when (a) everything the sort's child
            // produces fits the ANN leaf — anything above references at most
            // child.output — and (b) the index stores the TRUE vector values:
            // hnsw shards hold the original floats and l2sq-IVF lists hold
            // raw rows, but cos-IVF stores unit-normalized vectors, PQ
            // stores dequantized approximations, and hamming shards store
            // 16-bit word floats (not the table's b1 array<int>); emitting
            // those as the table's vector column would silently alter query
            // output, so such indexes always go through the join-back
            // (heap-fetch) form
            val storesTrueVectors =
              (meta.kind == "hnsw" && meta.metric != "hamming") ||
                (meta.kind == "ivf" && meta.metric != "cos")
            if (storesTrueVectors &&
                child.outputSet.subsetOf(AttributeSet(ann.output))) ann
            else {
              // candidates → fetch full rows: broadcast inner join on id
              val cid = AttributeReference("__graft_cand_id", LongType)()
              val cvec = AttributeReference("__graft_cand_vec", ArrayType(FloatType))()
              val candidates = Project(Seq(cid),
                AnnScanLogical(cid, cvec, meta.artifact, qq.toSeq, k,
                  searchParam, meta.kind, scanNprobe, meta.metric))
              Project(rel.output,
                Join(rel, candidates, Inner,
                  Some(EqualTo(idAttr, cid)),
                  JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST))))))
            }
        }
        rebuilt(gl, ll, s, projAbove, child, rel, newSource,
          predOpt.isDefined)
      }
      // weighted multi-term form: only when the single-distance form
      // didn't match, every term indexed on the same table. A predicate
      // is accepted ONLY in the reference's `max_dist` shape — the SAME
      // joint expression `< / <=` a literal (sql/lantern.sql:673-819's
      // max_dist parameter; general predicates keep the exact plan).
      // The original Filter re-applies above the join-back, so within
      // the candidate union semantics stay exact; like the reference,
      // a max_dist that starves the limit returns the passing subset
      // of the candidates.
      lazy val weightedRewritten = for {
        ws @ Sort(Seq(SortOrder(sortExpr, Ascending, _, _)), true, child, _) <- sortOpt
        (predOpt, rel, paths) <- findFilteredRelation(child)
        terms <- matchWeighted(resolveThroughProject(sortExpr, child))
        if terms.forall { case (w, _, a, _) => w > 0 && rel.outputSet.contains(a) }
        if predOpt.forall(p => isMaxDistPred(p, terms, child))
        metas = terms.map { case (_, m, a, _) => AnnCatalog.lookup(paths, a.name, m) }
        // per-term kind matrix, mirroring the scalar form's guards:
        // hnsw (non-hamming — the joint metric needs float vectors),
        // ivf, and the candidate-id kinds pq/ivfpq/bq for the
        // l2/angular family (their pre-ranks are meaningful there only)
        if metas.forall(_.exists(mm =>
          (mm.kind == "hnsw" && mm.metric != "hamming") ||
            mm.kind == "ivf" ||
            (Set("pq", "ivfpq", "bq", "mrl")(mm.kind) &&
              Set("l2sq", "cos")(mm.metric))))
        if metas.flatten.map(_.idCol).distinct.size == 1
        idAttr <- rel.output.find(_.name == metas.head.get.idCol)
      } yield {
        val cid = AttributeReference("__graft_wcand_id", LongType)()
        val ids = WeightedAnnIdsLogical(cid,
          terms.zip(metas).map { case ((_, _, _, q), metaOpt) =>
            val meta = metaOpt.get
            // a cos PQ index is an l2sq graph over unit vectors — the
            // query normalizes here, as in the scalar form
            val qq =
              if (meta.kind == "pq") Metric.normalizeIfCos(q, meta.metric)
              else q
            WeightedTerm(meta.artifact, qq.toSeq,
              math.max(efRuntime(meta), k), meta.kind,
              if (meta.kind == "ivf" || meta.kind == "ivfpq")
                nprobeRuntime(meta)
              else 0,
              meta.metric)
          })
        // join-back (heap-fetch) + the ORIGINAL Sort+Limit re-ranking by
        // the exact joint metric over the candidate union
        val newSource = Project(rel.output,
          Join(rel, ids, Inner, Some(EqualTo(idAttr, cid)),
            JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST))))))
        rebuilt(gl, ll, ws, projAbove, child, rel, newSource,
          predOpt.isDefined)
      }
      // MaxSim planner form: `ORDER BY maxsim_score(toks, Q) DESC
      // LIMIT k` over a table whose doc-array column carries a
      // `kind = "multivec"` registration → PLAID stage-1 candidate ids
      // + join-back; the ORIGINAL Sort+Limit re-scores candidates with
      // the exact codegen'd MaxSim (the bq pre-rank/rescore shape,
      // inverted order because bigger MaxSim is better). Scalar form
      // only — a predicate keeps the exact plan.
      // NullsLast only (the Descending default): stage-1 can never
      // propose a NULL-toks row, so a nulls-FIRST sort would lose the
      // rows the exact plan ranks first — decline rather than alter
      // output
      lazy val maxsimRewritten = for {
        ms @ Sort(orders, true, child, _) <- sortOpt
        SortOrder(sortExpr, Descending, NullsLast, _) <- orders.headOption
        (predOpt, rel, paths) <- findFilteredRelation(child)
        // a deterministic single-table predicate routes through the
        // adaptive over-fetch loop in the exec (exact filtered scan as
        // fallback); anything else keeps the exact plan
        if predOpt.forall(p =>
          p.deterministic && p.references.subsetOf(rel.outputSet))
        (vecAttr, qm) <- (resolveThroughProject(sortExpr, child) match {
          case MaxSimScore(a: AttributeReference, q) => Some((a, q))
          // SQL `maxsim_score(toks, <literal>)` parses to the
          // column-form expression — fold the literal matrix so the
          // scalar SQL query accelerates like the DataFrame form
          case MaxSimScoreCol(a: AttributeReference, q) if q.foldable =>
            foldTokMatrix(q).map(m => (a, m))
          case _ => None
        })
        meta <- AnnCatalog.lookup(paths, vecAttr.name, "maxsim")
        if meta.kind == "multivec"
        idAttr <- rel.output.find(_.name == meta.idCol)
        // an optional second sort key is accepted when it is exactly
        // the table's id column ascending (the deterministic tiebreak)
        if orders.tail.isEmpty || (orders.tail match {
          case Seq(SortOrder(a: AttributeReference, Ascending, _, _)) =>
            a.exprId == idAttr.exprId
          case _ => false
        })
      } yield {
        val cid = AttributeReference("__graft_mvcand_id", LongType)()
        val ids = MaxSimIdsLogical(cid, meta.artifact,
          qm.map(_.map(_.toFloat).toSeq).toSeq, k,
          cand = math.max(efRuntime(meta), k),
          nprobe = nprobeRuntime(meta),
          table = predOpt.map(_ => rel),
          pred = predOpt,
          idCol = meta.idCol,
          vecCol = meta.vecCol)
        val newSource = Project(rel.output,
          Join(rel, ids, Inner, Some(EqualTo(idAttr, cid)),
            JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST))))))
        rebuilt(gl, ll, ms, projAbove, child, rel, newSource,
          predOpt.isDefined)
      }
      // Sparse planner form: `ORDER BY sparse_dot(sv, Q) DESC [, id]
      // LIMIT k` over a table whose sparse column carries a
      // `kind = "sparse"` registration → bucket-pruned inverted
      // candidates + join-back; the ORIGINAL Sort+Limit re-scores with
      // the same exact SparseDot, so the rewrite is bit-equal to the
      // exact plan (candidates are the exact top-ef by the same score;
      // starvation falls back to the exact scan inside the exec). An
      // optional second sort key is accepted when it is exactly the
      // table's id column ascending — the deterministic tiebreak the
      // gates use. NullsLast only, same guard as maxsim. Scalar form
      // only — a predicate keeps the exact plan.
      lazy val sparseRewritten = for {
        sp @ Sort(orders, true, child, _) <- sortOpt
        SortOrder(sortExpr, Descending, NullsLast, _) <- orders.headOption
        (predOpt, rel, paths) <- findFilteredRelation(child)
        // a deterministic single-table predicate is accepted — the
        // FILTERED sparse form stays exact (the inverted file is
        // complete, so the survivor semi-join before the fold is the
        // exact filtered ranking, no adaptive loop); anything else
        // keeps the exact plan
        if predOpt.forall(p =>
          p.deterministic && p.references.subsetOf(rel.outputSet))
        (svAttr, qi, qv) <- matchSparse(resolveThroughProject(sortExpr, child))
        if qi.nonEmpty
        meta <- AnnCatalog.lookup(paths, svAttr.name, "sparsedot")
        if meta.kind == "sparse"
        idAttr <- rel.output.find(_.name == meta.idCol)
        if orders.tail.isEmpty || (orders.tail match {
          case Seq(SortOrder(a: AttributeReference, Ascending, _, _)) =>
            a.exprId == idAttr.exprId
          case _ => false
        })
      } yield {
        val cid = AttributeReference("__graft_spcand_id", LongType)()
        val ids = SparseAnnIdsLogical(cid, rel, meta.idCol, meta.vecCol,
          meta.artifact, qi, qv, k, math.max(efRuntime(meta), k), predOpt)
        val newSource = Project(rel.output,
          Join(rel, ids, Inner, Some(EqualTo(idAttr, cid)),
            JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST))))))
        rebuilt(gl, ll, sp, projAbove, child, rel, newSource,
          predOpt.isDefined)
      }
      rewritten.orElse(weightedRewritten).orElse(maxsimRewritten)
        .orElse(sparseRewritten).getOrElse(gl)
  }
}

/** Analyzer (post-hoc resolution) rule: correlated LATERAL top-k-by-
  * distance subqueries over an [[AnnCatalog]]-registered table →
  * [[AnnKnnJoinLogical]] (batched `searchMany`). Runs in the ANALYZER,
  * not the optimizer, because vanilla Spark's CheckAnalysis rejects
  * outer references under ORDER BY before any optimizer rule could see
  * them — the rewrite must happen first. The matched shape is exactly
  * what `FROM probes p, LATERAL (SELECT id FROM items ORDER BY
  * dist(vec, p.qvec) LIMIT k) t` analyzes to (the reference's LATERAL
  * plan test, lantern_hnsw/test/sql/hnsw_select.sql:66-69). Without a
  * registered index the SQL keeps failing analysis, mirroring the
  * reference where the lateral form is only ever answered by an index
  * scan. The full kind matrix: hnsw (batched graph search; hamming
  * probes are the table's b1 array<int>, word-packed per probe to
  * match shard layout), ivf (one partition-pruned pass over the union
  * of probed lists), pq (batched per-query LUT graph search + exact
  * rerank against the table's floats), and ivfpq (batched
  * residual-LUT scoring + the same exact rerank).
  */
class AnnLateralKnnRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.Cross

  /** Runtime search width (ef GUC over registration default), floored
    * at k — shared by every lateral form. */
  private def efRuntime(meta: AnnCatalog.IndexMeta, k: Int): Int =
    math.max({
      val c = graft.GraftConf.annEf(spark)
      if (c > 0) c else meta.ef
    }, k)

  /** Runtime coarse-probe width (nprobe GUC over registration). */
  private def nprobeRuntime(meta: AnnCatalog.IndexMeta): Int = {
    val c = graft.GraftConf.annNprobe(spark)
    if (c > 0) c else meta.effectiveNprobe
  }

  private def matchDistOuter(e: Expression)
      : Option[(String, AttributeReference, AttributeReference)] = e match {
    case L2SqDist(a: AttributeReference, OuterReference(o: AttributeReference)) =>
      Some(("l2sq", a, o))
    case L2SqDist(OuterReference(o: AttributeReference), a: AttributeReference) =>
      Some(("l2sq", a, o))
    case CosDist(a: AttributeReference, OuterReference(o: AttributeReference)) =>
      Some(("cos", a, o))
    case CosDist(OuterReference(o: AttributeReference), a: AttributeReference) =>
      Some(("cos", a, o))
    case UnaryMinus(InnerProduct(a: AttributeReference, OuterReference(o: AttributeReference)), _) =>
      Some(("inner", a, o))
    case UnaryMinus(InnerProduct(OuterReference(o: AttributeReference), a: AttributeReference), _) =>
      Some(("inner", a, o))
    case HammingDist(a: AttributeReference, OuterReference(o: AttributeReference)) =>
      Some(("hamming", a, o))
    case HammingDist(OuterReference(o: AttributeReference), a: AttributeReference) =>
      Some(("hamming", a, o))
    case _ => None
  }

  /** Relation through SubqueryAlias / attribute-only Project layers —
    * the analyzed (unoptimized) shape still carries aliases. */
  private def findRel(p: LogicalPlan): Option[(LogicalRelation, Seq[Path])] =
    p match {
      case SubqueryAlias(_, c) => findRel(c)
      case v: View => findRel(v.child)
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        findRel(c)
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation if AnnCatalog.anyFor(fs.location.rootPaths) =>
          Some((lr, fs.location.rootPaths))
        case _ => None
      }
      case _ => None
    }

  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => stripAlias(c)
    case _ => p
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case lj: LateralJoin
          if (lj.joinType == Inner || lj.joinType == Cross) &&
            lj.condition.isEmpty && lj.childrenResolved =>
        rewrite(lj).getOrElse(lj)
    }

  private def rewrite(lj: LateralJoin): Option[LogicalPlan] = {
    val subOut = lj.right.plan.output
    val candidate = stripAlias(lj.right.plan) match {
      case GlobalLimit(IntegerLiteral(k), LocalLimit(_, body))
          if k > 0 && k <= 1000 =>
        val sortOpt = stripAlias(body) match {
          case Project(ps, s: Sort) if ps.forall(_.isInstanceOf[Attribute]) =>
            Some(s)
          case s: Sort => Some(s)
          case _ => None
        }
        sortOpt.map(s => (k, s))
      case _ => None
    }
    // MaxSim lateral form: `ORDER BY maxsim_score(toks, p.qtoks) DESC
    // LIMIT k` with the query token matrix an OUTER column — batches
    // every probe through ONE PLAID stage-1 + rerank pass
    // (MultiVec.searchManyOnDisk), the multivec sibling of the
    // distance kinds below. NullsLast only, same reasoning as the
    // scalar maxsim form.
    lazy val maxsimForm = for {
      (k, Sort(Seq(SortOrder(
        MaxSimScoreCol(vecAttr: AttributeReference,
          OuterReference(outerAttr: AttributeReference)),
        Descending, NullsLast, _)), true, schild, _)) <- candidate
      if lj.left.outputSet.contains(outerAttr)
      if (outerAttr.dataType match {
        case ArrayType(ArrayType(FloatType, _), _) => true
        case _ => false
      })
      (rel, paths) <- findRel(schild)
      if rel.outputSet.contains(vecAttr)
      meta <- AnnCatalog.lookup(paths, vecAttr.name, "maxsim")
      if meta.kind == "multivec"
      idAttr <- rel.output.find(_.name == meta.idCol)
      if subOut.map(_.exprId) == Seq(idAttr.exprId)
    } yield AnnKnnJoinLogical(lj.left, outerAttr, subOut.head,
      meta.artifact, k, efRuntime(meta, k), "maxsim", "multivec",
      nprobeRuntime(meta), None, meta.idCol, meta.vecCol)
    // Sparse lateral form: `ORDER BY sparse_dot(sv, p.qsv) DESC
    // LIMIT k` with the probe's sparse struct an OUTER column — every
    // probe batched through ONE pruned inverted-file pass
    // (SparseSearch.searchManyOnDisk); the batched fold is EXACT over
    // the positive-score matches, so no rescore stage is needed.
    // Semantics note: a probe answers with its positive-score matches
    // ONLY (min(k, matches) rows; an empty/zero-overlap probe joins to
    // nothing) — the inner-join unanswerable-probe semantics every
    // lateral kind here shares, deliberately NOT padded with
    // zero-score rows (the scalar form's starvation fallback serves
    // single-query exactness; a per-probe exact fallback would defeat
    // the one-pass batching this form exists for).
    lazy val sparseForm = {
      def sparseType(t: org.apache.spark.sql.types.DataType): Boolean =
        t match {
          case StructType(Array(f0, f1)) =>
            (f0.dataType, f1.dataType) match {
              case (ArrayType(IntegerType, _), ArrayType(FloatType, _)) => true
              case _ => false
            }
          case _ => false
        }
      for {
        (k, Sort(Seq(SortOrder(sortExpr, Descending, NullsLast, _)),
          true, schild, _)) <- candidate
        (vecAttr, outerAttr) <- (sortExpr match {
          case graft.functions.SparseDot(a: AttributeReference,
              OuterReference(o: AttributeReference)) => Some((a, o))
          case graft.functions.SparseDot(OuterReference(o: AttributeReference),
              a: AttributeReference) => Some((a, o))
          case _ => None
        })
        if lj.left.outputSet.contains(outerAttr)
        if sparseType(outerAttr.dataType)
        (rel, paths) <- findRel(schild)
        if rel.outputSet.contains(vecAttr)
        meta <- AnnCatalog.lookup(paths, vecAttr.name, "sparsedot")
        if meta.kind == "sparse"
        idAttr <- rel.output.find(_.name == meta.idCol)
        if subOut.map(_.exprId) == Seq(idAttr.exprId)
      } yield AnnKnnJoinLogical(lj.left, outerAttr, subOut.head,
        meta.artifact, k, efRuntime(meta, k), "sparsedot", "sparse", 0,
        None, meta.idCol, meta.vecCol)
    }
    val distanceForm = for {
      (k, s @ Sort(Seq(SortOrder(sortExpr, Ascending, _, _)), true, schild, _)) <- candidate
      (metric, vecAttr, outerAttr) <- matchDistOuter(sortExpr)
      if lj.left.outputSet.contains(outerAttr)
      // probe column type per metric: float metrics take array<float>,
      // hamming takes the table's b1-packed array<int>
      if (outerAttr.dataType match {
        case ArrayType(FloatType, _) => metric != "hamming"
        case ArrayType(IntegerType, _) => metric == "hamming"
        case _ => false
      })
      (rel, paths) <- findRel(schild)
      if rel.outputSet.contains(vecAttr)
      meta <- AnnCatalog.lookup(paths, vecAttr.name, metric)
      // hamming graphs exist only as hnsw; a mislabeled ivf/pq
      // registration with metric=hamming would silently score l2sq
      // over word floats, so the kind filter pins it to hnsw
      if meta.metric != "hamming" || meta.kind == "hnsw"
      if meta.kind == "hnsw" ||
        meta.kind == "ivf" ||
        (meta.kind == "pq" && Set("l2sq", "cos")(meta.metric)) ||
        (meta.kind == "ivfpq" && Set("l2sq", "cos")(meta.metric)) ||
        (meta.kind == "bq" && Set("l2sq", "cos")(meta.metric)) ||
        (meta.kind == "mrl" && Set("l2sq", "cos")(meta.metric))
      idAttr <- rel.output.find(_.name == meta.idCol)
      // the subquery must emit exactly the table's id column
      if subOut.map(_.exprId) == Seq(idAttr.exprId)
    } yield AnnKnnJoinLogical(lj.left, outerAttr, subOut.head,
      meta.artifact, k, efRuntime(meta, k), metric, meta.kind,
      if (meta.kind == "ivf" || meta.kind == "ivfpq") nprobeRuntime(meta)
      else 0,
      if (AnnKnnJoinExec.TableKinds(meta.kind))
        Some(rel)
      else None,
      meta.idCol, meta.vecCol)
    distanceForm.orElse(maxsimForm).orElse(sparseForm)
  }
}

/** Session extension wiring — `SparkSessionExtensions` is the engine's
  * registration point, like CREATE EXTENSION in the reference.
  * Use: `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * Injects the planner rule, the physical strategy, AND the SQL
  * function surface (so `spark.sql("... l2sq_dist(v, q) ...")` works
  * without a registerAll call).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import graft.functions.{HammingDist, InnerProduct, L2Norm, StemWord}

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name, usage),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(s => new AnnRewriteRule(s))
    ext.injectPostHocResolutionRule(s => new AnnLateralKnnRule(s))
    ext.injectPlannerStrategy(_ => AnnStrategy)
    Seq(
      fn("l2sq_dist", "squared euclidean distance (lantern <->)")(
        es => L2SqDist(es(0), es(1))),
      fn("cos_dist", "cosine distance (lantern <=>)")(
        es => CosDist(es(0), es(1))),
      fn("hamming_dist", "packed-bit hamming distance (lantern <+>)")(
        es => HammingDist(es(0), es(1))),
      fn("inner_product", "dot product")(es => InnerProduct(es(0), es(1))),
      fn("sparse_dot", "sparse-vector dot product (sorted-merge)")(
        es => graft.functions.SparseDot(es(0), es(1))),
      fn("maxsim_score", "ColBERT MaxSim late-interaction score")(
        es => MaxSimScoreCol(es(0), es(1))),
      fn("vector_norm", "euclidean norm")(es => L2Norm(es(0))),
      fn("stem", "Porter2 English stem of one token")(es => StemWord(es(0))),
      fn("tokenize", "lowercase letter/number tokens")(
        es => graft.functions.TokenizeExpr(es(0))),
      fn("text_to_stem_array", "tokenize + stem + stopword drop")(
        es => graft.functions.StemTokensExpr(es(0),
          graft.text.PorterStemmer.defaultStopwords.toSeq)),
      fn("language_id", "marker-word language guess")(
        es => graft.functions.LanguageIdExpr(es(0), graft.text.TextAnalysis.markers)),
      fn("punct_ratio", "non-word, non-space character ratio")(
        es => graft.functions.PunctRatioExpr(es(0))),
      fn("unit_normalize", "unit-normalize a float vector")(
        es => graft.functions.UnitNormalize(es(0))),
      fn("quantize_f16", "vector elements to IEEE half bits")(
        es => graft.functions.QuantizeF16Expr(es(0))),
      fn("dequantize_f16", "IEEE half bits back to float32")(
        es => graft.functions.DequantizeF16Expr(es(0))),
      fn("quantize_i8", "linear i8 codes over [-1,1]")(
        es => graft.functions.QuantizeI8Expr(es(0), -1f, 1f)),
      fn("dequantize_i8", "i8 codes back to float32 levels")(
        es => graft.functions.DequantizeI8Expr(es(0), -1f, 1f)),
      fn("quantize_b1", "sign bits packed for hamming_dist")(
        es => graft.functions.QuantizeB1Expr(es(0))),
    ).foreach(ext.injectFunction)
  }
}
