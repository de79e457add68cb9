package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._

import graft.ops.MrlSearch

/** Matryoshka prefix index artifact — the planner-integrated form of
  * [[graft.ops.MrlSearch]] (Kusupati et al., "Matryoshka
  * Representation Learning", NeurIPS 2022): the artifact stores ONLY
  * the first-`m`-dimensions prefix of each vector (m/dim of the scan
  * bytes) plus a metadata file recording `m` — no training pass, no
  * graph, no codebook, making this the cheapest-to-build member of the
  * two-stage index family ([[BqIndex]] trades a centering pass for
  * 1-bit signatures; PQ/IVF train codebooks/centroids).
  *
  * A `kind = "mrl"` [[graft.plans.AnnCatalog]] registration makes
  * `ORDER BY l2sq_dist(v, q) LIMIT k` (or cos) rewrite to: prefix-
  * distance pre-rank over this artifact → broadcast join-back to the
  * table's full rows → the ORIGINAL Sort+Limit as the exact
  * full-dimension rescore. `ef` plays the rescore-pool role. The
  * artifact never stores full vectors; every planner form sources the
  * exact-rescore floats from the TABLE — scalar through the join-back,
  * filtered through the shared adaptive candidate loop, LATERAL
  * through [[graft.ops.MrlSearch.topKManyPrepacked]] against the
  * captured relation.
  *
  * Deletion story: the prefix table is a pure projection of the base
  * table, so tombstones follow the same shape as [[BqIndex]] —
  * [[delete]] appends ids, [[livePrefixes]] masks them with one anti
  * join before the top-pool heap.
  */
object MrlIndex {

  private val PrefixDir = "prefix"
  private val TombDir = "tombstones"
  private val MetaFile = "meta.json"

  /** Slice the prefix column and write the artifact. For
    * matryoshka-trained embeddings small `m` preserves recall; for
    * generic embeddings the pool (`ef`) is the recall knob. */
  def build(df: DataFrame, idCol: String, vecCol: String, m: Int,
      path: String): Unit = {
    require(m >= 1, s"graft: prefix dim m ($m) must be >= 1")
    val spark = df.sparkSession
    df.select(col(idCol).cast("long").as("id"),
        MrlSearch.prefix(col(vecCol), m).as("pref"))
      .write.mode("overwrite").parquet(s"$path/$PrefixDir")
    graft.util.MetaJson.write(spark, s"$path/$MetaFile", s"""{"m":$m}""")
  }

  /** Artifact sniff for serving layers that route by layout (the HTTP
    * façade's search/insert paths): an mrl artifact is the prefix
    * table + its recorded m. */
  def isMrl(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(s"$path/$PrefixDir")) &&
      fs.exists(new Path(s"$path/$MetaFile"))
  }

  /** The prefix length recorded at [[build]] time — the codec
    * parameter every query must share. */
  def m(spark: SparkSession, path: String): Int = {
    val f = s"$path/$MetaFile"
    graft.util.MetaJson.intField(
      graft.util.MetaJson.readRequired(spark, f, "not an mrl index"),
      "m", f)
  }

  /** `aminsert` analog: slice new rows with the PERSISTED m and append
    * them as new parquet files — the natural streaming shape. */
  def append(df: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val mm = m(df.sparkSession, path)
    df.select(col(idCol).cast("long").as("id"),
        MrlSearch.prefix(col(vecCol), mm).as("pref"))
      .write.mode("append").parquet(s"$path/$PrefixDir")
  }

  /** `ambulkdelete` analog — ids append to a tombstone dir, masked by
    * one anti join in every scan. */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("id").write.mode("append").parquet(s"$path/$TombDir")
  }

  /** The prefixes minus tombstones — what every search scans. */
  def livePrefixes(spark: SparkSession, path: String): DataFrame = {
    val b = spark.read.parquet(s"$path/$PrefixDir")
    val t = new Path(s"$path/$TombDir")
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(t))
      b.join(spark.read.parquet(t.toString), Seq("id"), "left_anti")
    else b
  }

  /** Parquet file count of the prefix table — the append-accumulation
    * measure serving layers compact on. */
  def fileCount(spark: SparkSession, path: String): Int = {
    val p = new Path(s"$path/$PrefixDir")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(st =>
      st.isFile && st.getPath.getName.endsWith(".parquet"))
  }

  /** Compact the append-accumulated prefix files back to
    * `numPartitions` and apply tombstones PHYSICALLY — the
    * consolidate/VACUUM analog, same snapshot-preserving tombstone
    * protocol as [[BqIndex.consolidate]]: a concurrent [[delete]]
    * keeps masking, the table swaps by rename. */
  def consolidate(spark: SparkSession, path: String,
      numPartitions: Int = 1): Unit = {
    require(numPartitions >= 1,
      s"graft: consolidate needs numPartitions >= 1, got $numPartitions")
    FlatArtifact.consolidateSubdir(spark, path, PrefixDir, "prefix",
      (live, compact) => live.coalesce(numPartitions)
        .write.mode("overwrite").parquet(compact))
  }

  /** `validate_index` analog for the prefix artifact (reference
    * validate_index.c:436-528): every stored prefix's length must
    * equal the RECORDED m (a short prefix mis-scores stage 1; a long
    * one means the meta lies about scan bytes), no null/duplicate ids;
    * with `source` supplied, every prefix must additionally re-derive
    * as the first-m slice of the source vector. Throws
    * [[IllegalStateException]] naming the FIRST violation; returns the
    * validated row count. */
  def validateIndex(spark: SparkSession, path: String,
      source: Option[(DataFrame, String, String)] = None): Long = {
    val mm = m(spark, path)
    val pre = spark.read.parquet(s"$path/$PrefixDir")
    val nullRow = pre.where(col("id").isNull || col("pref").isNull)
      .limit(1).collect()
    if (nullRow.nonEmpty) throw new IllegalStateException(
      s"graft: mrl index $path invalid — row with null id/pref")
    val badLen = pre.where(size(col("pref")) =!= mm)
      .select(col("id"), size(col("pref"))).limit(1).collect()
    if (badLen.nonEmpty) throw new IllegalStateException(
      s"graft: mrl index $path invalid — id ${badLen.head.getLong(0)} " +
        s"has prefix length ${badLen.head.getInt(1)}, expected the " +
        s"recorded m = $mm")
    val dup = pre.groupBy("id").count().where(col("count") > 1)
      .limit(1).collect()
    if (dup.nonEmpty) throw new IllegalStateException(
      s"graft: mrl index $path invalid — duplicate id ${dup.head.getLong(0)}")
    source.foreach { case (df, idCol, vecCol) =>
      val expected = df.select(col(idCol).cast("long").as("id"),
        MrlSearch.prefix(col(vecCol), mm).as("__exp"))
      // serving-set orphan check (tombstoned rows excused — a pending
      // table-first delete is not corruption; see IvfIndex)
      val orphan = FlatArtifact.minusTombstones(spark, path,
          pre.select("id"))
        .join(expected.select("id"), Seq("id"), "left_anti")
        .limit(1).collect()
      if (orphan.nonEmpty) throw new IllegalStateException(
        s"graft: mrl index $path invalid — id ${orphan.head.getLong(0)} " +
          "has no source row to re-derive from")
      // reverse direction: a source row absent from the prefix table
      // silently never surfaces in stage 1 — corruption the stored→
      // expected checks cannot see; tombstoned ids are excused
      val missing = FlatArtifact.minusTombstones(spark, path,
          expected.select("id")
            .join(pre.select("id"), Seq("id"), "left_anti"))
        .limit(1).collect()
      if (missing.nonEmpty) throw new IllegalStateException(
        s"graft: mrl index $path invalid — source id " +
          s"${missing.head.getLong(0)} is not stored (missing row)")
      val drift = pre.join(expected, Seq("id"))
        .where(!(col("pref") <=> col("__exp")))
        .select("id").limit(1).collect()
      if (drift.nonEmpty) throw new IllegalStateException(
        s"graft: mrl index $path invalid — id ${drift.head.getLong(0)}'s " +
          "prefix is not the first-m slice of its source vector")
    }
    pre.count()
  }

  /** Driver-side top-`pool` candidate ids by prefix distance — the
    * proposal function of the FILTERED planner form's adaptive loop
    * and the weighted union. One TakeOrderedAndProject over the
    * m/dim-sized scan. */
  def candidateIds(
      spark: SparkSession,
      path: String,
      query: Array[Float],
      pool: Int,
      metric: String = "l2sq"): Array[Long] = {
    val qp = query.take(m(spark, path))
    livePrefixes(spark, path)
      .orderBy(
        graft.ops.VectorSearch.distance(metric, col("pref"), lit(qp)),
        col("id"))
      .limit(math.max(1, pool))
      .select("id").collect().map(_.getLong(0))
  }

  /** Top-`pool` candidate rows for the scalar planner form — the vec
    * column is NULL by design (the artifact stores prefixes only), so
    * the join-back fetches the true rows and the Sort+Limit above IS
    * the exact full-dimension rescore. */
  def candidateRows(
      spark: SparkSession,
      path: String,
      query: Array[Float],
      pool: Int,
      metric: String = "l2sq"): RDD[InternalRow] = {
    val qp = query.take(m(spark, path))
    livePrefixes(spark, path)
      .orderBy(
        graft.ops.VectorSearch.distance(metric, col("pref"), lit(qp)),
        col("id"))
      .limit(math.max(1, pool))
      .selectExpr("id", "CAST(NULL AS ARRAY<FLOAT>) AS vec")
      .queryExecution.toRdd
  }
}
