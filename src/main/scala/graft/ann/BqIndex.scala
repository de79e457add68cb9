package graft.ann

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._

import graft.ops.BqSearch

/** Binary-quantization index artifact — the planner-integrated form of
  * [[graft.ops.BqSearch]] (the retrieval use of the reference's 1-bit
  * scalar kind, `quant_bits = 1`, lantern_hnsw/src/hnsw/options.c:137-158).
  * The artifact stores ONLY the sign-bit signatures (dim/32 ints per
  * row — a 32× reduction of the scanned bytes) plus the per-dimension
  * centering vector that is part of the codec. A `kind = "bq"`
  * [[graft.plans.AnnCatalog]] registration makes `ORDER BY
  * l2sq_dist(v, q) LIMIT k` (or cos/inner) rewrite to: hamming
  * pre-rank over this artifact → broadcast join-back to the table's
  * TRUE float rows → the ORIGINAL Sort+Limit, which therefore IS the
  * exact rescore stage. `ef` plays the rescore-pool role (the
  * recall/latency serving knob, like graph-search ef).
  *
  * Deliberately flat: no graph, no lists — stage 1 is a codegen'd
  * hamming scan with a per-partition top-pool heap
  * (TakeOrderedAndProject), embarrassingly parallel and shuffle-free
  * up to the pool-row merge, which is what a 1-bit pre-rank should be
  * at 100 TB. The artifact never stores floats (duplicating them would
  * defeat the 32× compression that is BQ's point): every planner form
  * sources the exact-rescore floats from the TABLE — the scalar
  * ORDER-BY rewrite through its join-back, the filtered form through
  * the shared adaptive candidate loop, and the LATERAL kNN-join form
  * through [[graft.ops.BqSearch.topKManyPrepacked]] against the
  * relation the rule captured.
  */
object BqIndex {

  private val BitsDir = "bits"
  private val CenterDir = "center"
  private val TombDir = "tombstones"

  /** Fit the centering vector over `df` and write the packed artifact. */
  def build(df: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val c = BqSearch.fitCenter(df, vecCol)
    Seq(c.toSeq).toDF("center")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/$CenterDir")
    df.select(col(idCol).cast("long").as("id"),
        BqSearch.pack(col(vecCol), c).as("bits"))
      .write.mode("overwrite").parquet(s"$path/$BitsDir")
  }

  def center(spark: SparkSession, path: String): Array[Float] =
    spark.read.parquet(s"$path/$CenterDir")
      .head().getSeq[Float](0).toArray

  /** Artifact sniff for serving layers that route by layout (the HTTP
    * façade's search path): a bq artifact is the bits + center pair. */
  def isBq(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(s"$path/$BitsDir")) &&
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/$CenterDir"))
  }

  /** The packed signatures as a DataFrame (id: long, bits: array<int>). */
  def bits(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/$BitsDir")

  /** `aminsert` analog: pack the new rows with the PERSISTED center —
    * the codec is fixed at build time (signatures must stay mutually
    * comparable; a drifting center would silently re-key the corpus) —
    * and append them as new parquet files. Parquet append is the
    * natural streaming shape: each micro-batch lands as its own files,
    * no rewrite of existing data, and the candidate scan sees them on
    * its next read. */
  def append(df: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val c = center(df.sparkSession, path)
    df.select(col(idCol).cast("long").as("id"),
        BqSearch.pack(col(vecCol), c).as("bits"))
      .write.mode("append").parquet(s"$path/$BitsDir")
  }

  /** `ambulkdelete` analog: tombstoned ids append to their own parquet
    * dir; [[liveBits]] masks them with one LEFT ANTI join BEFORE the
    * top-pool heap — EXACT delete semantics at any delete count (the
    * anti join broadcasts small sets and shuffles huge ones; no bloom
    * haircut needed because unlike an in-graph walk, a flat scan can
    * mask rows declaratively). */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("id").write.mode("append").parquet(s"$path/$TombDir")
  }

  /** The signatures minus tombstones — what every search scans. */
  def liveBits(spark: SparkSession, path: String): DataFrame = {
    val b = bits(spark, path)
    val t = new org.apache.hadoop.fs.Path(s"$path/$TombDir")
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(t)) b.join(spark.read.parquet(t.toString), Seq("id"), "left_anti")
    else b
  }

  /** Parquet file count of the bits table — the append-accumulation
    * measure serving layers compact on (each append/micro-batch lands
    * new files; a row-at-a-time inserter grows this linearly). */
  def fileCount(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$path/$BitsDir")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(st =>
      st.isFile && st.getPath.getName.endsWith(".parquet"))
  }

  /** Compact the append-accumulated bits files back to `numPartitions`
    * and apply tombstones PHYSICALLY (the consolidate/VACUUM analog
    * for the flat bits layout): tombstone files are snapshotted first
    * — only the snapshot is applied and retired, so a concurrent
    * [[delete]] keeps masking — and the table swaps by rename (the
    * compacted table is complete before the swap; single-writer for
    * the bits, like every maintenance op here). */
  def consolidate(spark: SparkSession, path: String,
      numPartitions: Int = 1): Unit = {
    require(numPartitions >= 1,
      s"graft: consolidate needs numPartitions >= 1, got $numPartitions")
    FlatArtifact.consolidateSubdir(spark, path, BitsDir, "bits",
      (live, compact) => live.coalesce(numPartitions)
        .write.mode("overwrite").parquet(compact))
  }

  /** `validate_index` analog for the bits artifact (reference
    * validate_index.c:436-528): structural checks — consistent
    * signature width (`ceil(dim/32)` words for the persisted center's
    * dim), no duplicate or null ids — plus the codec check: every
    * stored signature must RE-DERIVE from the persisted center and the
    * source table's vector (a bit drift means the row is filed under a
    * signature that no longer describes it — silent recall loss, or a
    * stale center). `df` must hold the rows the index was built on.
    * Throws [[IllegalStateException]] naming the FIRST violation;
    * returns the validated row count. */
  def validateIndex(df: DataFrame, idCol: String, vecCol: String,
      path: String): Long = {
    val spark = df.sparkSession
    val c = center(spark, path)
    val words = (c.length + 31) / 32
    val stored = bits(spark, path)
    val nullRow = stored.where(col("id").isNull || col("bits").isNull)
      .limit(1).collect()
    if (nullRow.nonEmpty) throw new IllegalStateException(
      s"graft: bq index $path invalid — row with null id/bits")
    val badLen = stored.where(size(col("bits")) =!= words)
      .select(col("id"), size(col("bits"))).limit(1).collect()
    if (badLen.nonEmpty) throw new IllegalStateException(
      s"graft: bq index $path invalid — id ${badLen.head.getLong(0)} has " +
        s"${badLen.head.getInt(1)} signature words, expected $words " +
        s"for dim ${c.length}")
    val dup = stored.groupBy("id").count().where(col("count") > 1)
      .limit(1).collect()
    if (dup.nonEmpty) throw new IllegalStateException(
      s"graft: bq index $path invalid — duplicate id ${dup.head.getLong(0)}")
    val expected = df.select(col(idCol).cast("long").as("id"),
      BqSearch.pack(col(vecCol), c).as("__exp"))
    // serving-set orphan check (tombstoned rows excused — a pending
    // table-first delete is not corruption; see IvfIndex)
    val orphan = FlatArtifact.minusTombstones(spark, path,
        stored.select("id"))
      .join(expected.select("id"), Seq("id"), "left_anti")
      .limit(1).collect()
    if (orphan.nonEmpty) throw new IllegalStateException(
      s"graft: bq index $path invalid — id ${orphan.head.getLong(0)} " +
        "has no source row to re-derive from")
    // the reverse direction too: a source row ABSENT from the bits
    // table is corruption the stored→expected checks cannot see (the
    // row silently never surfaces in stage 1); tombstoned ids excused
    val missing = FlatArtifact.minusTombstones(spark, path,
        expected.select("id")
          .join(stored.select("id"), Seq("id"), "left_anti"))
      .limit(1).collect()
    if (missing.nonEmpty) throw new IllegalStateException(
      s"graft: bq index $path invalid — source id " +
        s"${missing.head.getLong(0)} is not stored (missing row)")
    val drift = stored.join(expected, Seq("id"))
      .where(!(col("bits") <=> col("__exp")))
      .select("id").limit(1).collect()
    if (drift.nonEmpty) throw new IllegalStateException(
      s"graft: bq index $path invalid — id ${drift.head.getLong(0)}'s " +
        "bits do not re-derive from the persisted center")
    stored.count()
  }

  /** Driver-side top-`pool` candidate ids — the proposal function of
    * the FILTERED planner form's adaptive loop (pool quadruples per
    * round there, so a wide registration `ef` is the first round). */
  def candidateIds(
      spark: SparkSession,
      path: String,
      query: Array[Float],
      pool: Int): Array[Long] = {
    val qb = BqSearch.packQuery(query, center(spark, path))
    liveBits(spark, path)
      .orderBy(
        graft.functions.hamming_dist(col("bits"), lit(qb)), col("id"))
      .limit(math.max(1, pool))
      .select("id").collect().map(_.getLong(0))
  }

  /** Top-`pool` candidate ids by hamming distance to `query` — the
    * stage-1 pre-rank the planner splices under its join-back. The
    * vec column is NULL by design: this index never stores floats, the
    * join-back fetches the true rows. */
  def candidateRows(
      spark: SparkSession,
      path: String,
      query: Array[Float],
      pool: Int): RDD[InternalRow] = {
    val qb = BqSearch.packQuery(query, center(spark, path))
    liveBits(spark, path)
      .orderBy(
        graft.functions.hamming_dist(col("bits"), lit(qb)), col("id"))
      .limit(math.max(1, pool))
      .selectExpr("id", "CAST(NULL AS ARRAY<FLOAT>) AS vec")
      .queryExecution.toRdd
  }
}
