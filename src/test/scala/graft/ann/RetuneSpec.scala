package graft.ann

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.plans.AnnCatalog

/** [[Retune]] — the serving-budget refresh: sweeps a registration's
  * own knob (ef / nprobe) through the planner's rewrite against the
  * current corpus and re-registers the first qualifying value. */
class RetuneSpec extends SparkTestBase {

  private val dir = sf("sf0.001")
  private val tablePath = s"$dir/embeddings.parquet"

  private def withBq[T](ef: Int)(f: => T): T = {
    val e = Tables.embeddings(spark, dir)
    val path = java.nio.file.Files
      .createTempDirectory("graft-retune-bq").toString + "/idx"
    BqIndex.build(e, "vec_id", "embedding", path)
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq",
        ef = ef, kind = "bq"))
    try f finally AnnCatalog.unregister(spark, tablePath)
  }

  private def withIvf[T](nprobe: Int)(f: => T): T = {
    val e = Tables.embeddings(spark, dir)
    val path = java.nio.file.Files
      .createTempDirectory("graft-retune-ivf").toString + "/idx"
    IvfIndex.build(e, "vec_id", "embedding", path, nlists = 8)
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq",
        ef = 64, kind = "ivf", nprobe = nprobe))
    try f finally AnnCatalog.unregister(spark, tablePath)
  }

  test("bq: a starved rescore pool retunes to the first qualifying ef " +
      "and the registration is updated in place") {
    withBq(ef = 12) {
      val r = Retune.retune(spark, tablePath, "embedding", "l2sq",
        k = 10, queryCount = 5, targetRecall = 0.9, maxWiden = 64)
      assert(r.kind == "bq" && r.knob == "ef" && r.registered == 12)
      // grid is ascending doubling from the registered value
      assert(r.steps.map(_.value) ==
        r.steps.indices.map(i => 12 << i))
      // the stale budget provably under-serves on this corpus
      assert(r.steps.head.recall < 0.9)
      assert(r.picked.isDefined, "some pool up to 64x must qualify")
      val p = r.picked.get
      assert(r.steps.last.value == p && r.steps.last.recall >= 0.9)
      assert(r.steps.init.forall(_.recall < 0.9),
        "every cheaper step must be below target (first-qualifying pick)")
      assert(r.updated)
      assert(AnnCatalog.metaFor(spark, tablePath, "embedding", "l2sq")
        .get.ef == p)
      val df = Retune.reportDf(spark, r)
      assert(df.count() == r.steps.size)
      assert(df.where(col("picked")).count() == 1)
    }
  }

  test("ivf: the knob is nprobe and full-probe guarantees qualification") {
    withIvf(nprobe = 1) {
      val r = Retune.retune(spark, tablePath, "embedding", "l2sq",
        k = 10, queryCount = 5, targetRecall = 0.95, maxWiden = 8)
      assert(r.knob == "nprobe" && r.registered == 1)
      assert(r.picked.isDefined,
        "nprobe = nlists probes every list — exact, so it must qualify")
      if (r.updated)
        assert(AnnCatalog.metaFor(spark, tablePath, "embedding", "l2sq")
          .get.nprobe == r.picked.get)
    }
  }

  test("already-qualifying registration: no update, sweep stops at step 1") {
    withIvf(nprobe = 8) {
      val r = Retune.retune(spark, tablePath, "embedding", "l2sq",
        k = 10, queryCount = 5, targetRecall = 0.9, maxWiden = 8)
      assert(r.steps.size == 1 && r.picked.contains(8) && !r.updated)
      assert(AnnCatalog.metaFor(spark, tablePath, "embedding", "l2sq")
        .get.nprobe == 8)
    }
  }

  test("nothing qualifies up to the cap: picked None, registration intact") {
    withBq(ef = 12) {
      val r = Retune.retune(spark, tablePath, "embedding", "l2sq",
        k = 10, queryCount = 5, targetRecall = 1.01, maxWiden = 4)
      assert(r.picked.isEmpty && !r.updated)
      assert(r.steps.map(_.value) == Seq(12, 24, 48))
      assert(AnnCatalog.metaFor(spark, tablePath, "embedding", "l2sq")
        .get.ef == 12)
    }
  }

  test("the ef GUC is restored after the sweep (preset and unset)") {
    val key = graft.GraftConf.AnnEf
    withIvf(nprobe = 8) {
      spark.conf.set(key, "777")
      try {
        Retune.retune(spark, tablePath, "embedding", "l2sq",
          k = 10, queryCount = 3, targetRecall = 0.5, maxWiden = 2)
        assert(spark.conf.get(key) == "777")
      } finally spark.conf.unset(key)
      Retune.retune(spark, tablePath, "embedding", "l2sq",
        k = 10, queryCount = 3, targetRecall = 0.5, maxWiden = 2)
      assert(spark.conf.getOption(key).isEmpty)
      assert(spark.conf.getOption(graft.GraftConf.AnnNprobe).isEmpty)
    }
  }

  test("predicate-scoped retune measures the filtered planner form") {
    withBq(ef = 12) {
      val r = Retune.retune(spark, tablePath, "embedding", "l2sq",
        k = 5, queryCount = 4, targetRecall = 0.9, maxWiden = 64,
        predicate = Some(col("vec_id") % 2 === 0))
      assert(r.picked.isDefined)
      // the filtered pool requirement is at least the scalar form's:
      // half the candidates under the same hamming ranking survive
      assert(r.picked.get >= 12)
    }
  }

  test("catalogPath: an update is persisted and survives a reload") {
    val cat = java.nio.file.Files
      .createTempDirectory("graft-retune-cat").toString + "/catalog.json"
    withBq(ef = 12) {
      val r = Retune.retune(spark, tablePath, "embedding", "l2sq",
        k = 10, queryCount = 5, targetRecall = 0.9, maxWiden = 64,
        catalogPath = Some(cat))
      assert(r.updated, "the starved pool must have been widened")
      AnnCatalog.clear()
      assert(AnnCatalog.load(spark, cat) >= 1)
      assert(AnnCatalog.metaFor(spark, tablePath, "embedding", "l2sq")
        .get.ef == r.picked.get)
    }
  }

  test("multivec: both paired knobs widen by one factor and re-register") {
    import graft.ops.MultiVec
    val e = Tables.embeddings(spark, dir)
    // synth docs: 4 consecutive embeddings = one doc's token matrix
    val flat = e.select((col("vec_id") / 4).cast("long").as("mdoc"),
      (col("vec_id") % 4).cast("int").as("t_idx"),
      col("embedding").as("tok"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-retune-mv").toString
    MultiVec.docArrays(flat).write.parquet(s"$root/docs")
    MultiVec.writeIndex(flat, s"$root/idx", nlists = 8)
    val tbl = s"$root/docs"
    AnnCatalog.register(spark, tbl, AnnCatalog.IndexMeta(s"$root/idx",
      "mdoc", "toks", "maxsim", ef = 4, kind = "multivec", nprobe = 1))
    try {
      val r = Retune.retuneMultivec(spark, tbl, "toks",
        k = 5, queryCount = 4, targetRecall = 0.9, maxWiden = 32)
      assert(r.knob == "cand+nprobe" && r.registered == 4)
      // cand doubles per step from the registered value
      assert(r.steps.map(_.value) == r.steps.indices.map(i => 4 << i))
      assert(r.picked.isDefined,
        "full-probe (nprobe clamps to centroids) + wide cand must qualify")
      assert(r.steps.init.forall(_.recall < 0.9))
      if (r.updated) {
        val m = AnnCatalog.metaFor(spark, tbl, "toks", "maxsim").get
        assert(m.ef == r.picked.get)
        val factor = r.picked.get / 4
        assert(m.nprobe == factor) // nprobe0 = 1
      }
      // both GUCs restored
      assert(spark.conf.getOption(graft.GraftConf.AnnEf).isEmpty)
      assert(spark.conf.getOption(graft.GraftConf.AnnNprobe).isEmpty)
    } finally AnnCatalog.unregister(spark, tbl)
  }

  test("unregistered table: retune refuses rather than tuning a scan") {
    intercept[IllegalArgumentException] {
      Retune.retune(spark, tablePath, "embedding", "cos")
    }
  }

  test("hamming: a bits-column registration sweeps ef through its own " +
      "planner form — the metric-agnostic ef contract") {
    import graft.pq.ScalarQuantizer
    val root = java.nio.file.Files
      .createTempDirectory("graft-retune-ham").toString
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        ScalarQuantizer.quantize_b1(col("embedding")).as("bits"))
      .write.parquet(s"$root/tbl")
    val b1 = spark.read.parquet(s"$root/tbl")
    AnnIndex.build(b1, "vec_id", "bits", s"$root/idx",
      AnnParams(m = 8, efConstruction = 64, ef = 64,
        metric = "hamming", numPartitions = 2))
    AnnCatalog.register(spark, s"$root/tbl", AnnCatalog.IndexMeta(
      s"$root/idx", "vec_id", "bits", "hamming", ef = 10))
    try {
      val r = Retune.retune(spark, s"$root/tbl", "bits", "hamming",
        k = 10, queryCount = 5, targetRecall = 0.9, maxWiden = 64)
      assert(r.kind == "hnsw" && r.knob == "ef" && r.registered == 10)
      assert(r.steps.map(_.value) == r.steps.indices.map(i => 10 << i))
      assert(r.picked.isDefined,
        "a 64x-wide beam over this corpus must reach 0.9")
      assert(r.steps.init.forall(_.recall < 0.9))
      if (r.updated)
        assert(AnnCatalog.metaFor(spark, s"$root/tbl", "bits", "hamming")
          .get.ef == r.picked.get)
      assert(spark.conf.getOption(graft.GraftConf.AnnEf).isEmpty)
    } finally AnnCatalog.unregister(spark, s"$root/tbl")
  }

  test("hamming under a non-hnsw kind is refused as a mislabel") {
    withIvf(nprobe = 8) {
      // re-register the same artifact claiming hamming: the planner
      // would never rewrite it, so retune must refuse loudly
      val meta = AnnCatalog.metaFor(spark, tablePath, "embedding", "l2sq").get
      AnnCatalog.register(spark, tablePath, meta.copy(metric = "hamming"))
      intercept[IllegalArgumentException] {
        Retune.retune(spark, tablePath, "embedding", "hamming")
      }
    }
  }

  test("multivec: predicate scopes both the truth and the measured " +
      "planner form to the filtered workload") {
    import graft.ops.MultiVec
    val e = Tables.embeddings(spark, dir)
    val flat = e.select((col("vec_id") / 4).cast("long").as("mdoc"),
      (col("vec_id") % 4).cast("int").as("t_idx"),
      col("embedding").as("tok"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-retune-mvp").toString
    MultiVec.docArrays(flat).write.parquet(s"$root/docs")
    MultiVec.writeIndex(flat, s"$root/idx", nlists = 8)
    val tbl = s"$root/docs"
    AnnCatalog.register(spark, tbl, AnnCatalog.IndexMeta(s"$root/idx",
      "mdoc", "toks", "maxsim", ef = 4, kind = "multivec", nprobe = 1))
    try {
      // retuneMultivec throws mid-sweep if the FILTERED maxsim form
      // stops rewriting — a green run certifies the measured path
      val r = Retune.retuneMultivec(spark, tbl, "toks",
        k = 5, queryCount = 4, targetRecall = 0.9, maxWiden = 32,
        predicate = Some(col("mdoc") % 2 === 0))
      assert(r.picked.isDefined,
        "full-probe + wide cand must qualify under the predicate")
      // the truth was computed over the scoped corpus: every sampled
      // query id satisfies the predicate (hashSample over scoped rows)
      assert(r.steps.nonEmpty)
    } finally AnnCatalog.unregister(spark, tbl)
  }

  test("multivec: the batched exact truth matches the per-query sort") {
    import graft.ops.MultiVec
    val e = Tables.embeddings(spark, dir)
    val flat = e.select((col("vec_id") / 4).cast("long").as("mdoc"),
      (col("vec_id") % 4).cast("int").as("t_idx"),
      col("embedding").as("tok"))
    val docs = MultiVec.docArrays(flat).persist()
    try {
      val qs = docs.orderBy(col("mdoc")).limit(3)
        .collect()
        .map(r => (r.getLong(0),
          r.getSeq[scala.collection.Seq[Float]](1).map(_.toArray).toArray))
      val batched = MultiVec
        .maxsimJoinExact(docs, "mdoc", "toks", qs.toSeq, 5)
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      qs.foreach { case (qid, qm) =>
        val perQuery = docs
          .orderBy(MultiVec.maxsimCol(col("toks"), qm).desc, col("mdoc"))
          .limit(5).select(col("mdoc"))
          .collect().map(_.getLong(0)).toSet
        assert(batched(qid) == perQuery,
          s"batched truth for query $qid diverged from the serving sort")
      }
    } finally { docs.unpersist(); () }
  }
}
