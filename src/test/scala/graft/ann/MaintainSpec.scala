package graft.ann

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.plans.AnnCatalog

/** [[Maintain]] — the one-command sweep: compact fragmented artifacts,
  * validate each against its current source, retune stale budgets;
  * a corrupt index is reported and skipped, never retuned, and never
  * aborts the rest of the sweep. */
class MaintainSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-maint").toString +
      s"/$name"

  // a private copy of the embeddings table (registrations key on the
  // table path; tests need distinct paths)
  private def tableCopy(name: String): String = {
    val p = tmp(name)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .write.parquet(p)
    p
  }

  test("sweep compacts, validates, and retunes a fragmented starved bq " +
      "while leaving a healthy hnsw untouched") {
    val tblA = tableCopy("a")
    val tblB = tableCopy("b")
    val a = spark.read.parquet(tblA)
    val maxId = a.agg(max(col("vec_id"))).head().getLong(0)
    val bqIdx = tmp("bq")
    BqIndex.build(a.where(col("vec_id") <= maxId / 2),
      "vec_id", "embedding", bqIdx)
    BqIndex.append(a.where(col("vec_id") > maxId / 2),
      "vec_id", "embedding", bqIdx)
    val hnswIdx = tmp("hnsw")
    AnnIndex.build(spark.read.parquet(tblB), "vec_id", "embedding",
      hnswIdx, AnnParams(m = 8, efConstruction = 64, numPartitions = 2))
    AnnCatalog.register(spark, tblA, AnnCatalog.IndexMeta(bqIdx,
      "vec_id", "embedding", "l2sq", ef = 12, kind = "bq"))
    AnnCatalog.register(spark, tblB, AnnCatalog.IndexMeta(hnswIdx,
      "vec_id", "embedding", "l2sq", ef = 64))
    try {
      val entries = Maintain.sweep(spark, targetRecall = 0.9,
        queryCount = 4, maxWiden = 64, consolidateOver = 1)
      assert(entries.size == 2)
      val bq = entries.find(_.kind == "bq").get
      assert(bq.consolidated && bq.filesAfter < bq.filesBefore)
      assert(bq.valid && bq.validatedRows == a.count())
      assert(bq.knob == "ef" && bq.knobBefore == 12)
      assert(bq.retuned && bq.knobAfter > 12)
      assert(bq.recallAfter >= 0.9)
      assert(AnnCatalog.metaFor(spark, tblA, "embedding", "l2sq")
        .get.ef == bq.knobAfter)
      val h = entries.find(_.kind == "hnsw").get
      // 2 shards > consolidateOver=1 — compaction applies to hnsw too
      assert(h.consolidated && h.filesAfter <= h.filesBefore)
      assert(h.valid && !h.retuned && h.knobAfter == 64)
      assert(h.recallAfter >= 0.9)
      val df = Maintain.sweepDf(spark, entries)
      assert(df.count() == 2)
      assert(df.columns.contains("notes"))
    } finally {
      AnnCatalog.unregister(spark, tblA)
      AnnCatalog.unregister(spark, tblB)
    }
  }

  test("a corrupt index is reported invalid, not retuned, and the rest " +
      "of the sweep proceeds") {
    val tblA = tableCopy("bad-src")
    val tblB = tableCopy("good-src")
    val a = spark.read.parquet(tblA)
    val maxId = a.agg(max(col("vec_id"))).head().getLong(0)
    // artifact covers only HALF the table it is registered against —
    // the expected->stored completeness check must flag it
    val badIdx = tmp("bad-bq")
    BqIndex.build(a.where(col("vec_id") <= maxId / 2),
      "vec_id", "embedding", badIdx)
    val goodIdx = tmp("good-bq")
    BqIndex.build(spark.read.parquet(tblB), "vec_id", "embedding", goodIdx)
    AnnCatalog.register(spark, tblA, AnnCatalog.IndexMeta(badIdx,
      "vec_id", "embedding", "l2sq", ef = 512, kind = "bq"))
    AnnCatalog.register(spark, tblB, AnnCatalog.IndexMeta(goodIdx,
      "vec_id", "embedding", "l2sq", ef = 512, kind = "bq"))
    try {
      val entries = Maintain.sweep(spark, queryCount = 3,
        consolidateOver = 1000)
      val bad = entries.find(_.table.contains("bad-src")).get
      assert(!bad.valid && bad.notes.contains("validate:"))
      assert(!bad.retuned && bad.knob.isEmpty)
      // the healthy sibling was still fully maintained
      val good = entries.find(_.table.contains("good-src")).get
      assert(good.valid && good.recallAfter >= 0.9)
    } finally {
      AnnCatalog.unregister(spark, tblA)
      AnnCatalog.unregister(spark, tblB)
    }
  }

  test("ivf list skew past 4x raises the stale-centroid note") {
    import spark.implicits._
    import org.apache.spark.sql.functions.max
    val spread = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val v = spread.orderBy("vec_id").head().getSeq[Float](1).toArray
    val maxId = spread.agg(max(col("vec_id"))).head().getLong(0)
    // a tight late cluster: data drifted after the centroids persisted
    // (200 near-identical rows over a ~500-row/16-list base lands one
    // list at ~230 rows vs a ~44-row mean — skew ≈ 5x)
    val tight = (0 until 200).map { i =>
      (maxId + 1 + i, v.updated(0, v(0) + i * 1e-6f).toSeq)
    }.toDF("vec_id", "embedding")
    val tbl = tmp("skew-tbl")
    spread.unionAll(tight).write.parquet(tbl)
    val idx = tmp("skew-ivf")
    IvfIndex.build(spread, "vec_id", "embedding", idx, nlists = 16)
    IvfIndex.append(tight, "vec_id", "embedding", idx)
    AnnCatalog.register(spark, tbl, AnnCatalog.IndexMeta(idx,
      "vec_id", "embedding", "l2sq", ef = 64, kind = "ivf", nprobe = 8))
    try {
      val e = Maintain.sweep(spark, queryCount = 3,
        consolidateOver = 1000)
        .find(_.table.contains("skew-tbl")).get
      assert(e.valid, e.notes)
      assert(e.listSkew > 4.0,
        s"200 drifted rows into one of 16 lists must skew: ${e.listSkew}")
      assert(e.notes.contains("list skew"))

      // recluster applies the structural fix: fresh coarse kmeans over
      // the current table - skew collapses, the artifact re-validates,
      // and the rebuilt layout still serves
      val e2 = Maintain.sweep(spark, queryCount = 3,
        consolidateOver = 1000, recluster = true)
        .find(_.table.contains("skew-tbl")).get
      assert(e2.notes.contains("reclustered"), e2.notes)
      assert(e2.listSkew < e.listSkew)
      assert(e2.recallAfter >= 0.9)
      // the swapped-in artifact re-validates against the table in full
      // (entry.valid certified the PRE-swap artifact)
      val src = Some((spark.read.parquet(tbl), "vec_id", "embedding"))
      assert(IvfIndex.validateIndex(spark, idx, src) ===
        spark.read.parquet(tbl).count())
    } finally AnnCatalog.unregister(spark, tbl)
  }

  test("recluster never resurrects tombstoned rows; the excusal carries") {
    import spark.implicits._
    import org.apache.spark.sql.functions.max
    val spread = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val v = spread.orderBy("vec_id").head().getSeq[Float](1).toArray
    val maxId = spread.agg(max(col("vec_id"))).head().getLong(0)
    val tight = (0 until 200).map { i =>
      (maxId + 1 + i, v.updated(0, v(0) + i * 1e-6f).toSeq)
    }.toDF("vec_id", "embedding")
    val tbl = tmp("resur-tbl")
    spread.unionAll(tight).write.parquet(tbl)
    val idx = tmp("resur-ivf")
    IvfIndex.build(spread, "vec_id", "embedding", idx, nlists = 16)
    IvfIndex.append(tight, "vec_id", "embedding", idx)
    // the index deletes rows the (lagging) table still holds
    val deleted = (0L until 10L).map(maxId + 1 + _)
    IvfIndex.delete(spark, idx, deleted)
    AnnCatalog.register(spark, tbl, AnnCatalog.IndexMeta(idx,
      "vec_id", "embedding", "l2sq", ef = 64, kind = "ivf", nprobe = 16))
    try {
      val e = Maintain.sweep(spark, queryCount = 3,
        consolidateOver = 1000, recluster = true)
        .find(_.table.contains("resur-tbl")).get
      assert(e.notes.contains("reclustered"), e.notes)
      assert(e.valid, e.notes)
      // deleted rows are physically absent from the rebuilt artifact
      val storedIds = spark.read.parquet(s"$idx/data")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(deleted.forall(id => !storedIds.contains(id)),
        "recluster must not resurrect index-deleted rows from the table")
      // and the carried tombstones keep excusing them against the
      // lagging table: the validator still passes in full
      val src = Some((spark.read.parquet(tbl), "vec_id", "embedding"))
      assert(IvfIndex.validateIndex(spark, idx, src) ===
        spark.read.parquet(tbl).count() - deleted.size)
    } finally AnnCatalog.unregister(spark, tbl)
  }

  test("a hamming registration is swept like any other — the ef knob " +
      "is metric-agnostic") {
    import graft.pq.ScalarQuantizer
    val tbl = tmp("ham-bits")
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        ScalarQuantizer.quantize_b1(col("embedding")).as("bits"))
      .write.parquet(tbl)
    val idx = tmp("ham-hnsw")
    AnnIndex.build(spark.read.parquet(tbl), "vec_id", "bits", idx,
      AnnParams(m = 8, efConstruction = 64, ef = 64,
        metric = "hamming", numPartitions = 2))
    AnnCatalog.register(spark, tbl, AnnCatalog.IndexMeta(idx,
      "vec_id", "bits", "hamming", ef = 10))
    try {
      val entries = Maintain.sweep(spark, targetRecall = 0.9,
        queryCount = 3, maxWiden = 64, consolidateOver = 1000)
      val e = entries.find(_.table.contains("ham-bits")).get
      assert(e.valid, e.notes)
      assert(e.knob == "ef" && e.knobBefore == 10,
        s"hamming must be swept, not noted n/a: ${e.notes}")
      assert(e.recallAfter >= 0.9)
      assert(!e.notes.contains("retune n/a"))
    } finally AnnCatalog.unregister(spark, tbl)
  }

  test("sparse retune stays n/a (exact pre-rank) — the note names it") {
    import graft.ops.SparseSearch
    val tbl = tableCopy("sparse-src")
    val e = spark.read.parquet(tbl)
    val sp = SparseSearch.postings(
      e.select(col("vec_id"),
        SparseSearch.sparsify(col("embedding"), 0.0f).as("sv")),
      "vec_id", col("sv"))
    val idx = tmp("sparse-idx")
    SparseSearch.writePostings(sp, idx, buckets = 4)
    AnnCatalog.register(spark, tbl, AnnCatalog.IndexMeta(idx,
      "vec_id", "sv", "sparsedot", ef = 64, kind = "sparse"))
    try {
      val entries = Maintain.sweep(spark, queryCount = 3,
        consolidateOver = 1000, validate = false)
      val en = entries.find(_.table.contains("sparse-src")).get
      assert(!en.retuned && en.notes.contains("retune n/a"))
    } finally AnnCatalog.unregister(spark, tbl)
  }

  test("recluster is refused under validate=false — the no-resurrection " +
      "contract needs the validation pass") {
    import spark.implicits._
    import org.apache.spark.sql.functions.max
    val spread = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val v = spread.orderBy("vec_id").head().getSeq[Float](1).toArray
    val maxId = spread.agg(max(col("vec_id"))).head().getLong(0)
    val tight = (0 until 200).map { i =>
      (maxId + 1 + i, v.updated(0, v(0) + i * 1e-6f).toSeq)
    }.toDF("vec_id", "embedding")
    val tbl = tmp("noval-tbl")
    spread.unionAll(tight).write.parquet(tbl)
    val idx = tmp("noval-ivf")
    IvfIndex.build(spread, "vec_id", "embedding", idx, nlists = 16)
    IvfIndex.append(tight, "vec_id", "embedding", idx)
    AnnCatalog.register(spark, tbl, AnnCatalog.IndexMeta(idx,
      "vec_id", "embedding", "l2sq", ef = 64, kind = "ivf", nprobe = 16))
    try {
      val centroidsBefore = spark.read.parquet(s"$idx/centroids").collect()
        .map(_.toString).sorted.toSeq
      val e = Maintain.sweep(spark, queryCount = 3,
        consolidateOver = 1000, recluster = true, validate = false)
        .find(_.table.contains("noval-tbl")).get
      assert(e.listSkew > 4.0)
      assert(e.notes.contains("recluster refused"), e.notes)
      assert(!e.notes.contains("reclustered:"))
      // the artifact was NOT touched
      val centroidsAfter = spark.read.parquet(s"$idx/centroids").collect()
        .map(_.toString).sorted.toSeq
      assert(centroidsAfter == centroidsBefore)
    } finally AnnCatalog.unregister(spark, tbl)
  }

  test("a failed tombstone carry preserves the backup — injected " +
      "conflict at the carry window") {
    import spark.implicits._
    import org.apache.spark.sql.functions.max
    val spread = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val maxId = spread.agg(max(col("vec_id"))).head().getLong(0)
    val tbl = tmp("carry-tbl")
    spread.write.parquet(tbl)
    val idx = tmp("carry-ivf")
    IvfIndex.build(spread, "vec_id", "embedding", idx, nlists = 8)
    // pending tombstones the carry must not lose
    val deleted = (0L until 5L).map(i => maxId - i)
    IvfIndex.delete(spark, idx, deleted)
    val meta = AnnCatalog.IndexMeta(idx, "vec_id", "embedding", "l2sq",
      ef = 64, kind = "ivf", nprobe = 8)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ex = intercept[IllegalStateException] {
      Maintain.reclusterArtifact(spark, tbl, meta, beforeTombCarry = () => {
        // a conflicting FILE lands where the tombstone dir must go —
        // the carry must refuse and keep the backup, never delete it
        val p = new org.apache.hadoop.fs.Path(s"$idx/tombstones")
        val out = fs.create(p, false)
        out.writeBytes("not a directory")
        out.close()
      })
    }
    assert(ex.getMessage.contains("NOT deleted"))
    // the pending tombstones survived, preserved in the backup
    val backupTomb = new org.apache.hadoop.fs.Path(
      s"$idx.replaced/tombstones")
    assert(fs.exists(backupTomb),
      "the backup (with the only copy of the pending deletes) must " +
        "survive a failed carry")
    val carried = spark.read.parquet(backupTomb.toString)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(deleted.toSet.subsetOf(carried))
  }

  test("a stale .reclustering dir from a crashed attempt does not brick " +
      "recluster") {
    import spark.implicits._
    import org.apache.spark.sql.functions.max
    val spread = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val v = spread.orderBy("vec_id").head().getSeq[Float](1).toArray
    val maxId = spread.agg(max(col("vec_id"))).head().getLong(0)
    val tight = (0 until 200).map { i =>
      (maxId + 1 + i, v.updated(0, v(0) + i * 1e-6f).toSeq)
    }.toDF("vec_id", "embedding")
    val tbl = tmp("stale-tbl")
    spread.unionAll(tight).write.parquet(tbl)
    val idx = tmp("stale-ivf")
    IvfIndex.build(spread, "vec_id", "embedding", idx, nlists = 16)
    IvfIndex.append(tight, "vec_id", "embedding", idx)
    // simulate the crashed prior attempt: a half-written tmp dir
    val stale = new org.apache.hadoop.fs.Path(s"$idx.reclustering/data")
    val fs = stale.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(stale)
    AnnCatalog.register(spark, tbl, AnnCatalog.IndexMeta(idx,
      "vec_id", "embedding", "l2sq", ef = 64, kind = "ivf", nprobe = 16))
    try {
      val e = Maintain.sweep(spark, queryCount = 3,
        consolidateOver = 1000, recluster = true)
        .find(_.table.contains("stale-tbl")).get
      assert(e.notes.contains("reclustered"), e.notes)
      assert(e.valid, e.notes)
    } finally AnnCatalog.unregister(spark, tbl)
  }

  test("parallel sweep: entries run concurrently on session clones, " +
      "GUCs never leak into the caller's session") {
    val tblA = tableCopy("par-a")
    val tblB = tableCopy("par-b")
    val bqIdx = tmp("par-bq")
    BqIndex.build(spark.read.parquet(tblA), "vec_id", "embedding", bqIdx)
    val ivfIdx = tmp("par-ivf")
    IvfIndex.build(spark.read.parquet(tblB), "vec_id", "embedding",
      ivfIdx, nlists = 8)
    AnnCatalog.register(spark, tblA, AnnCatalog.IndexMeta(bqIdx,
      "vec_id", "embedding", "l2sq", ef = 12, kind = "bq"))
    AnnCatalog.register(spark, tblB, AnnCatalog.IndexMeta(ivfIdx,
      "vec_id", "embedding", "l2sq", ef = 64, kind = "ivf", nprobe = 1))
    // a sentinel in the caller's session: concurrent retunes steering
    // their clones' GUCs must never touch it
    spark.conf.set(graft.GraftConf.AnnEf, "31337")
    try {
      val entries = Maintain.sweep(spark, targetRecall = 0.9,
        queryCount = 4, maxWiden = 64, consolidateOver = 1000,
        parallelism = 2)
      assert(entries.size == 2)
      val bq = entries.find(_.kind == "bq").get
      assert(bq.valid && bq.retuned && bq.knobAfter > 12, bq.notes)
      assert(bq.recallAfter >= 0.9)
      val ivf = entries.find(_.kind == "ivf").get
      assert(ivf.valid && ivf.knob == "nprobe", ivf.notes)
      assert(ivf.recallAfter >= 0.9)
      // both registrations updated in the SHARED catalog
      assert(AnnCatalog.metaFor(spark, tblA, "embedding", "l2sq")
        .get.ef == bq.knobAfter)
      // the caller's session conf is untouched
      assert(spark.conf.get(graft.GraftConf.AnnEf) == "31337")
    } finally {
      spark.conf.unset(graft.GraftConf.AnnEf)
      AnnCatalog.unregister(spark, tblA)
      AnnCatalog.unregister(spark, tblB)
    }
  }

  test("same-table registrations share one lane: a parallel sweep over " +
      "a table with multivec + scalar registrations retunes both and " +
      "the persisted catalog holds BOTH fresh budgets") {
    import graft.ops.MultiVec
    val e = Tables.embeddings(spark, dir)
    val flat = e.select((col("vec_id") / 4).cast("long").as("mdoc"),
      (col("vec_id") % 4).cast("int").as("t_idx"),
      col("embedding").as("tok"))
    val root = tmp("lane")
    // ONE table carrying both vector shapes — a doc-token matrix
    // (multivec/maxsim) and a flat per-doc vector (bq/l2sq): two
    // registrations on one catalog key, the exact seam where
    // retuneMultivec's truth-pass lift could clobber a sibling's
    // concurrent re-registration if the entries ran in parallel
    MultiVec.docArrays(flat)
      .withColumn("embedding", element_at(col("toks"), 1))
      .write.parquet(s"$root/docs")
    val tbl = s"$root/docs"
    MultiVec.writeIndex(flat, s"$root/mv", nlists = 8)
    BqIndex.build(spark.read.parquet(tbl), "mdoc", "embedding", s"$root/bq")
    AnnCatalog.register(spark, tbl, AnnCatalog.IndexMeta(s"$root/mv",
      "mdoc", "toks", "maxsim", ef = 4, kind = "multivec", nprobe = 1))
    AnnCatalog.register(spark, tbl, AnnCatalog.IndexMeta(s"$root/bq",
      "mdoc", "embedding", "l2sq", ef = 4, kind = "bq"))
    val cat = tmp("lane-cat") + "/catalog.json"
    try {
      val entries = Maintain.sweep(spark, targetRecall = 0.9,
        queryCount = 4, maxWiden = 64, consolidateOver = 1000,
        catalogPath = Some(cat), parallelism = 2)
      assert(entries.size == 2)
      val mv = entries.find(_.kind == "multivec").get
      val bq = entries.find(_.kind == "bq").get
      assert(mv.valid && bq.valid, s"${mv.notes} | ${bq.notes}")
      // both budgets were starved (4 < k = 10) and must widen
      assert(mv.retuned && mv.knobAfter > 4, mv.notes)
      assert(bq.retuned && bq.knobAfter > 4, bq.notes)
      // neither in-memory write was lost to the sibling's lift/restore
      assert(AnnCatalog.metaFor(spark, tbl, "toks", "maxsim")
        .get.ef == mv.knobAfter)
      assert(AnnCatalog.metaFor(spark, tbl, "embedding", "l2sq")
        .get.ef == bq.knobAfter)
      // and the PERSISTED catalog holds both fresh budgets
      AnnCatalog.clear()
      assert(AnnCatalog.load(spark, cat) == 2)
      assert(AnnCatalog.metaFor(spark, tbl, "toks", "maxsim")
        .get.ef == mv.knobAfter)
      assert(AnnCatalog.metaFor(spark, tbl, "embedding", "l2sq")
        .get.ef == bq.knobAfter)
    } finally AnnCatalog.unregister(spark, tbl)
  }

  test("a failed consolidate is a named casualty — the sweep continues " +
      "and the healthy sibling's retune still persists") {
    val tblA = tableCopy("cons-bad")
    val tblB = tableCopy("cons-good")
    val badIdx = tmp("cons-bad-bq")
    BqIndex.build(spark.read.parquet(tblA), "vec_id", "embedding", badIdx)
    val goodIdx = tmp("cons-good-bq")
    BqIndex.build(spark.read.parquet(tblB), "vec_id", "embedding", goodIdx)
    // inject a corrupt data file into A's bits table: the fragmentation
    // listing still counts it (tripping the threshold), but the
    // consolidate's read throws — which must land in `notes`, not
    // abort the sweep
    val garbage = new org.apache.hadoop.fs.Path(s"$badIdx/bits/zz.parquet")
    val fs = garbage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(garbage, false)
    out.writeBytes("not a parquet file")
    out.close()
    AnnCatalog.register(spark, tblA, AnnCatalog.IndexMeta(badIdx,
      "vec_id", "embedding", "l2sq", ef = 512, kind = "bq"))
    AnnCatalog.register(spark, tblB, AnnCatalog.IndexMeta(goodIdx,
      "vec_id", "embedding", "l2sq", ef = 4, kind = "bq"))
    val cat = tmp("cons-cat") + "/catalog.json"
    try {
      val entries = Maintain.sweep(spark, targetRecall = 0.9,
        queryCount = 4, maxWiden = 64, consolidateOver = 1,
        catalogPath = Some(cat))
      assert(entries.size == 2, "one bad artifact must not abort the sweep")
      val bad = entries.find(_.table.contains("cons-bad")).get
      assert(!bad.consolidated && bad.notes.contains("consolidate:"),
        bad.notes)
      val good = entries.find(_.table.contains("cons-good")).get
      assert(good.valid && good.retuned && good.knobAfter > 4, good.notes)
      // the healthy sibling's fresh budget reached the persisted catalog
      AnnCatalog.clear()
      assert(AnnCatalog.load(spark, cat) == 2)
      assert(AnnCatalog.metaFor(spark, tblB, "embedding", "l2sq")
        .get.ef == good.knobAfter)
    } finally {
      AnnCatalog.unregister(spark, tblA)
      AnnCatalog.unregister(spark, tblB)
    }
  }
}
