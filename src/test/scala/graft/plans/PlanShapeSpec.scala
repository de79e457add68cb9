package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions._
import graft.ops.MaskedExplain

/** Plan-shape assertions: the physical plans the engine promises
  * (SURVEY.md §4) — exact k-NN must be TakeOrderedAndProject (per-
  * partition heap, no global sort), scans must prune columns, the one-
  * row query side must broadcast, and distance expressions must stay
  * inside whole-stage codegen.
  */
class PlanShapeSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    MaskedExplain.explain(df, "formatted")

  test("exact kNN compiles to TakeOrderedAndProject, not global Sort+Limit") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val q = e.select("embedding").head().getSeq[Float](0).toArray
    val p = plan(e.orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10))
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(!p.contains("GlobalSort"))
  }

  test("projection prunes the parquet read schema") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val p = plan(e.select("vec_id"))
    // ReadSchema must carry only the selected column, not embedding
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("vec_id") && !readSchema.contains("embedding"),
      readSchema)
  }

  test("filter pushes down to the parquet scan") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val p = plan(e.where(col("label") > 3).select("vec_id"))
    assert(p.contains("PushedFilters: [IsNotNull(label), GreaterThan(label,3)]"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("one-row query side broadcasts in exactVsRow") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val qr = e.where(col("vec_id") === 0).select(col("embedding").as("q"))
    val p = plan(graft.ops.VectorSearch.exactVsRow(
      e, "embedding", qr, "q", k = 5))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(800))
  }

  test("distance expressions run inside WholeStageCodegen") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val q = e.select("embedding").head().getSeq[Float](0).toArray
    val df = e.select(l2sq_dist(col("embedding"), lit(q)).as("d"))
    // formatted mode marks codegen stages with '*'; the projection
    // carrying the distance expression must be starred (codegen), not a
    // fallback interpreted Project
    val p = plan(df)
    assert(p.contains("* Project"), p.take(600))
  }

  test("PQ / IVF-PQ asymmetric-distance search plans: codegen'd ADC, no ScalaUDF") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    def noUdf(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val udfs = df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
        case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
      })
      assert(udfs.isEmpty, s"ScalaUDF in $tag plan: $udfs")
    }
    val q = e.select("embedding").head().getSeq[Float](0).toArray
    // full-table PQ scan (PqAdcDistFixed)
    val cb = graft.pq.ProductQuantizer.trainCodebook(
      e, "embedding", subvectors = 8, clusters = 16, seed = 3)
    val pq = graft.pq.ProductQuantizer.quantizeTable(e, "embedding", cb)
    val lutOnly = graft.pq.ProductQuantizer
      .searchPq(pq, "vec_id", "embedding_pq", cb, q, 5)
    noUdf(lutOnly, "searchPq")
    // ADC parity with a driver-side LUT sum on one row
    val lut = cb.l2sqLut(q)
    val r0 = pq.orderBy("vec_id").select("vec_id", "embedding_pq").head()
    val expect = r0.getSeq[Short](1).zipWithIndex
      .map { case (c, s) => lut(s)(c.toInt) }.sum
    val got = graft.pq.ProductQuantizer
      .searchPq(pq.where(col("vec_id") === r0.getLong(0)),
        "vec_id", "embedding_pq", cb, q, 1)
      .head().getDouble(1)
    assert(math.abs(got - expect) < 1e-12, s"$got vs $expect")
    // batched multi-query scan (PqAdcDistKeyed by query_id)
    val queries = e.orderBy("vec_id").limit(3)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    noUdf(graft.pq.ProductQuantizer
      .searchPqMany(pq, "vec_id", "embedding_pq", cb, queries, 5), "searchPqMany")
    // IVF-PQ probed-list scan (PqAdcDistKeyed by list_id)
    val dir = java.nio.file.Files.createTempDirectory("graft-psadc").toString + "/idx"
    graft.ann.IvfPqIndex.build(e, "vec_id", "embedding", dir,
      nlists = 4, subvectors = 8, clusters = 16)
    noUdf(graft.ann.IvfPqIndex.search(spark, dir, q, 5, nprobe = 2), "ivfpq lut")
    noUdf(graft.ann.IvfPqIndex.search(spark, dir, q, 5, nprobe = 2,
      rerank = Some((e, "vec_id", "embedding"))), "ivfpq rerank")
  }

  test("IVF assignment + scalar quant columns stay codegen — no ScalaUDF") {
    import org.apache.spark.sql.graftshim.GraftSqlShim
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val centroids = e.limit(4).collect()
      .map(_.getSeq[Float](e.schema.fieldIndex("embedding")).toArray)
    val df = e.select(
      GraftSqlShim.column(NearestCentroid(
        GraftSqlShim.expression(col("embedding")), centroids)).as("list_id"),
      GraftSqlShim.column(UnitNormalize(
        GraftSqlShim.expression(col("embedding")))).as("unit"),
      graft.pq.ScalarQuantizer.quantize_i8(col("embedding")).as("q8"),
      graft.pq.ScalarQuantizer.quantize_f16(col("embedding")).as("q16"),
      graft.pq.ScalarQuantizer.quantize_b1(col("embedding")).as("qb"))
    val optimized = df.queryExecution.optimizedPlan
    val udfs = optimized.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
    })
    assert(udfs.isEmpty, s"ScalaUDF in plan: $udfs")
    assert(plan(df).contains("* Project"))
    // parity with the kernel functions the UDF forms wrapped
    val row = df.limit(1).collect().head
    val v = e.select("embedding").head().getSeq[Float](0).toArray
    assert(row.getInt(0) == graft.ann.IvfIndex.nearestList(v, centroids))
    assert(row.getSeq[Byte](2).toArray
      .sameElements(graft.pq.ScalarQuantizer.quantizeI8(v)))
    assert(row.getSeq[Short](3).toArray
      .sameElements(graft.pq.ScalarQuantizer.quantizeF16(v)))
    assert(row.getSeq[Int](4).toArray
      .sameElements(graft.pq.ScalarQuantizer.quantizeB1(v)))
  }

  test("planner fires through Filter into AnnFilteredIds; starvation stays exact") {
    import graft.ann.{AnnIndex, AnnParams}
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val path = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-fplan").toFile, "idx").toString
    AnnIndex.build(e, "vec_id", "embedding", path,
      AnnParams(m = 8, efConstruction = 64, ef = 64, numPartitions = 2))
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = 64))
    try {
      val q = e.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).toArray
      val pred = col("vec_id") % 3 === 0
      val knn = e.where(pred)
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      assert(knn.queryExecution.optimizedPlan.collect {
        case a: AnnFilteredIdsLogical => a
      }.nonEmpty, knn.queryExecution.optimizedPlan.toString)
      val got = knn.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got.forall(_ % 3 == 0), s"predicate violated: $got")
      val exact = e.where(pred)
        .withColumn("d", l2sq_dist(col("embedding"), lit(q)))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got.intersect(exact).size >= 8, s"recall too low: $got vs $exact")

      // starving predicate (< k survivors): the execution-time exact
      // fallback must return ALL surviving rows — the reason the old
      // rule refused to fire through a Filter no longer holds
      val starved = e.where(col("vec_id") < 3)
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      assert(starved.queryExecution.optimizedPlan.collect {
        case a: AnnFilteredIdsLogical => a
      }.nonEmpty)
      assert(starved.select("vec_id").collect().map(_.getLong(0)).toSet
        == Set(0L, 1L, 2L))

      // a non-deterministic predicate must NOT fire the index path
      val nondet = e.where(rand(7) > -1)
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      assert(nondet.queryExecution.optimizedPlan.collect {
        case a: AnnFilteredIdsLogical => a
      }.isEmpty)

      // SQL text goes through the same rule — the reference's
      // has_index_scan assertions are SQL-level (hnsw_select.sql:52-53)
      spark.read.parquet(tablePath).createOrReplaceTempView("emb_fplan")
      val qLit = q.map(x => s"CAST($x AS FLOAT)").mkString("array(", ",", ")")
      val sqlKnn = spark.sql(
        s"""SELECT vec_id FROM emb_fplan WHERE vec_id % 3 = 0
           |ORDER BY l2sq_dist(embedding, $qLit) LIMIT 10""".stripMargin)
      assert(sqlKnn.queryExecution.optimizedPlan.collect {
        case a: AnnFilteredIdsLogical => a
      }.nonEmpty, sqlKnn.queryExecution.optimizedPlan.toString)
      assert(sqlKnn.collect().map(_.getLong(0)).toSet.intersect(exact).size >= 8)
    } finally AnnCatalog.unregister(spark, tablePath)
  }

  test("lateral kNN join analyzes + plans into AnnKnnJoin (searchMany path)") {
    import graft.ann.{AnnIndex, AnnParams}
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val path = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-latplan").toFile, "idx").toString
    AnnIndex.build(e, "vec_id", "embedding", path,
      AnnParams(m = 8, efConstruction = 64, ef = 64, numPartitions = 2))
    val tablePath = s"$dir/embeddings.parquet"
    spark.read.parquet(tablePath).createOrReplaceTempView("emb_lat")
    val sql =
      """SELECT p.vec_id AS qid, t.vec_id AS nid
        |FROM (SELECT vec_id, embedding FROM emb_lat WHERE vec_id < 3) p,
        |LATERAL (
        |  SELECT vec_id FROM emb_lat
        |  ORDER BY l2sq_dist(embedding, p.embedding) LIMIT 2
        |) t""".stripMargin

    // vanilla semantics preserved: with no index registered the SQL
    // keeps failing analysis, exactly as stock Spark rejects it
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(sql).collect()
    }

    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = 64))
    try {
      val q = spark.sql(sql)
      assert(q.queryExecution.optimizedPlan.collect {
        case a: AnnKnnJoinLogical => a
      }.nonEmpty, q.queryExecution.optimizedPlan.toString)
      assert(q.queryExecution.executedPlan.collect {
        case a: AnnKnnJoinExec => a
      }.nonEmpty)
      // joined output is produced DISTRIBUTIVELY (probe rows
      // re-parallelized, k-fanout expanded map-side from the broadcast
      // neighbor map) — not one driver-materialized partition
      assert(q.queryExecution.toRdd.getNumPartitions > 1,
        s"kNN-join output came from ${q.queryExecution.toRdd.getNumPartitions} partition(s)")
      val rows = q.collect().map(r => (r.getLong(0), r.getLong(1)))
      val byQ = rows.groupBy(_._1)
      assert(byQ.keySet == Set(0L, 1L, 2L))
      assert(byQ.values.forall(_.length == 2))
      // every probe's nearest neighbor is itself (probe rows are in the
      // indexed table)
      assert(byQ.forall { case (qid, ns) => ns.map(_._2).contains(qid) })

      // the probe-side ingest is byte-budget-gated: an over-budget
      // outer side must AUTO-ROUTE to the distributed chunked path
      // (probe rows persisted on the cluster, budget-sized searchMany
      // chunks, RDD join-back) and return the SAME rows — no error,
      // and a budget of 8 bytes forces one chunk per probe
      val budgetKey = graft.GraftConf.KnnJoinBroadcastBytes
      spark.conf.set(budgetKey, "8")
      try {
        val distributed = spark.sql(sql).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(distributed == rows.sorted.toSeq,
          s"distributed path diverged: $distributed vs ${rows.sorted.toSeq}")
      } finally spark.conf.unset(budgetKey)
    } finally AnnCatalog.unregister(spark, tablePath)
  }

  test("lateral kNN join routes through ivf, pq, bq and hamming index kinds") {
    import graft.ann.{AnnIndex, AnnParams, IvfIndex, PqAnnIndex}
    import graft.pq.{ProductQuantizer, ScalarQuantizer}
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-latk").toFile
    val tablePath = s"$dir/embeddings.parquet"
    spark.read.parquet(tablePath).createOrReplaceTempView("emb_latk")
    val sql =
      """SELECT p.vec_id AS qid, t.vec_id AS nid
        |FROM (SELECT vec_id, embedding FROM emb_latk WHERE vec_id < 3) p,
        |LATERAL (
        |  SELECT vec_id FROM emb_latk
        |  ORDER BY l2sq_dist(embedding, p.embedding) LIMIT 2
        |) t""".stripMargin
    def checkKind(kind: String): Unit = {
      val q = spark.sql(sql)
      val nodes = q.queryExecution.optimizedPlan.collect {
        case a: AnnKnnJoinLogical => a
      }
      assert(nodes.nonEmpty && nodes.head.kind == kind, s"$kind: ${nodes.map(_.kind)}")
      val byQ = q.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      assert(byQ.keySet == Set(0L, 1L, 2L), s"$kind: ${byQ.keySet}")
      assert(byQ.values.forall(_.length == 2), s"$kind")
      // self is its own nearest neighbor under l2sq
      assert(byQ.forall { case (qid, ns) => ns.map(_._2).contains(qid) }, s"$kind")
    }
    // ivf
    val ivfPath = new java.io.File(tmp, "ivf").toString
    IvfIndex.build(e, "vec_id", "embedding", ivfPath, nlists = 8)
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(ivfPath, "vec_id", "embedding", "l2sq", ef = 64,
        kind = "ivf", nprobe = 4))
    try checkKind("ivf") finally AnnCatalog.unregister(spark, tablePath)
    // pq (LUT search + exact rerank against the table's floats)
    val pqPath = new java.io.File(tmp, "pq").toString
    val cb = ProductQuantizer.trainCodebook(
      e, "embedding", subvectors = 8, clusters = 16)
    PqAnnIndex.build(e, "vec_id", "embedding", pqPath, cb,
      AnnParams(m = 8, efConstruction = 64, ef = 64, numPartitions = 2))
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(pqPath, "vec_id", "embedding", "l2sq", ef = 256,
        kind = "pq"))
    try checkKind("pq") finally AnnCatalog.unregister(spark, tablePath)
    // bq (batched hamming pre-rank + exact rescore against the table)
    val bqPath = new java.io.File(tmp, "bq").toString
    graft.ann.BqIndex.build(e, "vec_id", "embedding", bqPath)
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(bqPath, "vec_id", "embedding", "l2sq",
        ef = e.count().toInt, kind = "bq"))
    try checkKind("bq") finally AnnCatalog.unregister(spark, tablePath)
    // hamming: probes are b1 array<int>, repacked per probe by the exec
    val b1Tbl = new java.io.File(tmp, "b1tbl").toString
    e.select(col("vec_id"),
        ScalarQuantizer.quantize_b1(col("embedding")).as("bits"))
      .write.parquet(b1Tbl)
    val b1 = spark.read.parquet(b1Tbl)
    b1.createOrReplaceTempView("emb_lath")
    val hamPath = new java.io.File(tmp, "ham").toString
    AnnIndex.build(b1, "vec_id", "bits", hamPath,
      AnnParams(m = 8, efConstruction = 64, ef = 128,
        metric = "hamming", numPartitions = 2))
    AnnCatalog.register(spark, b1Tbl,
      AnnCatalog.IndexMeta(hamPath, "vec_id", "bits", "hamming", ef = 128))
    try {
      val q = spark.sql(
        """SELECT p.vec_id AS qid, t.vec_id AS nid
          |FROM (SELECT vec_id, bits FROM emb_lath WHERE vec_id < 3) p,
          |LATERAL (
          |  SELECT vec_id FROM emb_lath
          |  ORDER BY hamming_dist(bits, p.bits) LIMIT 2
          |) t""".stripMargin)
      val nodes = q.queryExecution.optimizedPlan.collect {
        case a: AnnKnnJoinLogical => a
      }
      assert(nodes.nonEmpty && nodes.head.metric == "hamming",
        nodes.map(n => (n.kind, n.metric)).toString)
      val byQ = q.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      assert(byQ.keySet == Set(0L, 1L, 2L))
      assert(byQ.values.forall(_.length == 2))
      // distance-multiset criterion (hamming ties massively): each
      // probe's 2 neighbors must sit at the exact top-2 distances
      val bitsById = b1.collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
      def hd(a: Array[Int], b: Array[Int]): Int =
        a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      byQ.foreach { case (qid, ns) =>
        val got = ns.map(n => hd(bitsById(qid), bitsById(n._2))).sorted.toSeq
        val exact = bitsById.values
          .map(v => hd(bitsById(qid), v)).toSeq.sorted.take(2)
        assert(got == exact, s"qid=$qid got=$got exact=$exact")
      }
    } finally AnnCatalog.unregister(spark, b1Tbl)
  }

  test("SET spark.graft.ann.ef overrides the planner search width at runtime") {
    import graft.ann.{AnnIndex, AnnParams}
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val path = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-efguc").toFile, "idx").toString
    AnnIndex.build(e, "vec_id", "embedding", path,
      AnnParams(m = 8, efConstruction = 64, ef = 64, numPartitions = 2))
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = 64))
    try {
      val q = e.select("embedding").head().getSeq[Float](0).toArray
      def scanEf = e.select(col("vec_id"), col("embedding"))
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(5)
        .queryExecution.optimizedPlan.collect {
          case a: AnnScanLogical => a.ef
        }.head
      assert(scanEf == 64) // registration default
      spark.conf.set(graft.GraftConf.AnnEf, "97")
      try assert(scanEf == 97) // the GUC reaches the plan, like SET lantern_hnsw.ef
      finally spark.conf.unset(graft.GraftConf.AnnEf)
      assert(scanEf == 64)
    } finally AnnCatalog.unregister(spark, tablePath)

    // and the coarse-probe counterpart for the ivf kind
    import graft.ann.IvfIndex
    val ivfPath = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-npguc").toFile, "idx").toString
    IvfIndex.build(e, "vec_id", "embedding", ivfPath, nlists = 8)
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(ivfPath, "vec_id", "embedding", "l2sq", ef = 64,
        kind = "ivf", nprobe = 2))
    try {
      val q = e.select("embedding").head().getSeq[Float](0).toArray
      def scanNp = e.select(col("vec_id"), col("embedding"))
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(5)
        .queryExecution.optimizedPlan.collect {
          case a: AnnScanLogical => a.ef // ivf routes nprobe through ef
        }.head
      assert(scanNp == 2)
      spark.conf.set(graft.GraftConf.AnnNprobe, "6")
      try assert(scanNp == 6)
      finally spark.conf.unset(graft.GraftConf.AnnNprobe)
      assert(scanNp == 2)
    } finally AnnCatalog.unregister(spark, tablePath)

    // and the multivec kind: ef drives the stage-1 candidate budget,
    // nprobe the per-query-token probed-list count
    import graft.ops.MultiVec
    val toks = MultiVec.tokens(e, "vec_id", "embedding", 4)
    val base = java.nio.file.Files.createTempDirectory("graft-mvguc").toString
    MultiVec.writeIndex(toks, s"$base/idx", nlists = 8)
    MultiVec.docArrays(toks).write.parquet(s"$base/docs")
    AnnCatalog.register(spark, s"$base/docs", AnnCatalog.IndexMeta(
      s"$base/idx", "mdoc", "toks", "maxsim", ef = 24, kind = "multivec",
      nprobe = 3))
    try {
      val qm = MultiVec.queryToks(toks, Seq(0L)).map(_._3)
      val docs = spark.read.parquet(s"$base/docs")
      def knobs = docs
        .orderBy(MultiVec.maxsimCol(col("toks"), qm).desc).limit(5)
        .queryExecution.optimizedPlan.collect {
          case m: MaxSimIdsLogical => (m.cand, m.nprobe)
        }.head
      assert(knobs == ((24, 3)))
      spark.conf.set(graft.GraftConf.AnnEf, "40")
      spark.conf.set(graft.GraftConf.AnnNprobe, "5")
      try assert(knobs == ((40, 5)))
      finally {
        spark.conf.unset(graft.GraftConf.AnnEf)
        spark.conf.unset(graft.GraftConf.AnnNprobe)
      }
      assert(knobs == ((24, 3)))
    } finally AnnCatalog.unregister(spark, s"$base/docs")
  }

  test("bq kind: scalar rewrite = hamming pre-rank + join-back exact rescore") {
    import graft.ann.BqIndex
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val path = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-bq").toFile, "idx").toString
    BqIndex.build(e, "vec_id", "embedding", path)
    val tablePath = s"$dir/embeddings.parquet"
    val n = e.count().toInt
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = n,
        kind = "bq"))
    try {
      val q = e.where(col("vec_id") === 3).select("embedding")
        .head().getSeq[Float](0).toArray
      val knn = e.select(col("vec_id"), col("embedding"))
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      val opt = knn.queryExecution.optimizedPlan
      // the ANN leaf is the bq artifact scan ...
      assert(opt.collect {
        case a: AnnScanLogical if a.kind == "bq" => a
      }.nonEmpty, opt.toString.take(800))
      // ... always behind the join-back (bq stores no floats)
      assert(opt.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.nonEmpty, opt.toString.take(800))
      // pool = corpus ⇒ the rescore returns the EXACT top-10
      val got = knn.select("vec_id").collect().map(_.getLong(0)).toSeq
      val exact = e.orderBy(l2sq_dist(col("embedding"), lit(q)), col("vec_id"))
        .limit(10).select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(got.toSet == exact.toSet)
      // filtered form fires into the adaptive AnnFilteredIds loop —
      // and with pool = corpus its answers are the EXACT filtered top-k
      val filtered = e.where(col("label") > 2)
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      assert(filtered.queryExecution.optimizedPlan.collect {
        case a: AnnFilteredIdsLogical if a.kind == "bq" => a
      }.nonEmpty)
      val fGot = filtered.select("vec_id").collect().map(_.getLong(0)).toSet
      val fExact = e.where(col("label") > 2)
        .orderBy(l2sq_dist(col("embedding"), lit(q)), col("vec_id"))
        .limit(10).select("vec_id").collect().map(_.getLong(0)).toSet
      assert(fGot == fExact)
      // ambulkdelete analog: tombstoned ids vanish from the planner
      // answers (EXACT masking — anti-join, no bloom haircut)
      val victim = exact.head
      graft.ann.BqIndex.delete(spark, path, Seq(victim))
      val after = e.select(col("vec_id"), col("embedding"))
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(!after.contains(victim))
      assert((exact.toSet - victim).subsetOf(after)) // pool = corpus: rest intact
    } finally AnnCatalog.unregister(spark, tablePath)
  }

  test("pq kind: scalar rewrite = LUT pre-rank + join-back exact rescore over the pool") {
    import graft.ann.{AnnParams, PqAnnIndex}
    import graft.pq.ProductQuantizer
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val path = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-pqps").toFile, "idx").toString
    val cb = ProductQuantizer.trainCodebook(
      e, "embedding", subvectors = 8, clusters = 16)
    PqAnnIndex.build(e, "vec_id", "embedding", path, cb,
      AnnParams(m = 8, efConstruction = 64, numPartitions = 2))
    val tablePath = s"$dir/embeddings.parquet"
    val n = e.count().toInt
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = n,
        kind = "pq"))
    try {
      val q = e.where(col("vec_id") === 3).select("embedding")
        .head().getSeq[Float](0).toArray
      val knn = e.select(col("vec_id"), col("embedding"))
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      val opt = knn.queryExecution.optimizedPlan
      // the ANN leaf is the pq candidate scan (ids only — the codes
      // never dequantize into the plan) ...
      assert(opt.collect {
        case a: AnnScanLogical if a.kind == "pq" => a
      }.nonEmpty, opt.toString.take(800))
      // ... always behind the join-back: pq never passes
      // storesTrueVectors, so the Sort+Limit above rescores the pool
      // against the TABLE's float rows
      assert(opt.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.nonEmpty, opt.toString.take(800))
      // pool = corpus ⇒ the exact rescore returns the EXACT top-10
      // (the pre-fix per-shard top-k pool capped this at LUT recall)
      val got = knn.select("vec_id").collect().map(_.getLong(0)).toSeq
      val exact = e.orderBy(l2sq_dist(col("embedding"), lit(q)), col("vec_id"))
        .limit(10).select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(got.toSet == exact.toSet)
      // ambulkdelete analog: a tombstoned id is masked inside the LUT
      // walk and can never ride the candidate path
      val victim = exact.head
      PqAnnIndex.delete(spark, path, Seq(victim))
      val after = e.select(col("vec_id"), col("embedding"))
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(!after.contains(victim))
      assert((exact.toSet - victim).subsetOf(after)) // pool = corpus: rest intact
    } finally AnnCatalog.unregister(spark, tablePath)
  }

  test("multivec kind: maxsim DESC rewrite = PLAID pre-rank + exact join-back rescore") {
    import graft.ops.MultiVec
    val dir = sf("sf0.001")
    val toks = MultiVec.tokens(Tables.embeddings(spark, dir),
      "vec_id", "embedding", 4)
    val base = java.nio.file.Files.createTempDirectory("graft-mvp").toString
    MultiVec.writeIndex(toks.where(col("mdoc") =!= 0), s"$base/idx", nlists = 8)
    MultiVec.docArrays(toks.where(col("mdoc") =!= 0))
      .write.parquet(s"$base/docs")
    val qm = MultiVec.queryToks(toks, Seq(0L)).map(_._3)
    val docs = spark.read.parquet(s"$base/docs")
    val nDocs = docs.count().toInt
    AnnCatalog.register(spark, s"$base/docs", AnnCatalog.IndexMeta(
      s"$base/idx", "mdoc", "toks", "maxsim",
      ef = nDocs, kind = "multivec", nprobe = 8))
    try {
      val knn = docs
        .orderBy(MultiVec.maxsimCol(col("toks"), qm).desc).limit(5)
      val opt = knn.queryExecution.optimizedPlan
      assert(opt.collect { case m: MaxSimIdsLogical => m }.nonEmpty,
        opt.toString.take(800))
      assert(opt.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.nonEmpty, opt.toString.take(800))
      // candidate budget = corpus + every list probed ⇒ EXACT top-5
      val got = knn.select("mdoc").collect().map(_.getLong(0)).toSeq
      val exact = MultiVec.scoreDocs(docs, qm)
        .orderBy(col("score").desc, col("mdoc")).limit(5)
        .select("mdoc").collect().map(_.getLong(0)).toSeq
      assert(got.toSet == exact.toSet, s"$got vs $exact")
      // tombstoned docs never surface through the planner path either
      MultiVec.deleteDocs(spark, s"$base/idx", Seq(got.head))
      val afterDel = docs
        .orderBy(MultiVec.maxsimCol(col("toks"), qm).desc).limit(5)
        .select("mdoc").collect().map(_.getLong(0)).toSet
      assert(!afterDel.contains(got.head) && afterDel.nonEmpty)
      // FILTERED form fires (adaptive over-fetch; full budget here ⇒
      // exact), with the tombstoned doc excluded on both sides
      val filtered = docs.where(col("mdoc") % 3 === 1)
        .orderBy(MultiVec.maxsimCol(col("toks"), qm).desc, col("mdoc"))
        .limit(5)
      assert(filtered.queryExecution.optimizedPlan.collect {
        case m: MaxSimIdsLogical if m.pred.isDefined => m }.nonEmpty)
      val fGot = filtered.select("mdoc").collect().map(_.getLong(0)).toSeq
      val fExact = MultiVec.scoreDocs(
          docs.where(col("mdoc") % 3 === 1 && col("mdoc") =!= got.head), qm)
        .orderBy(col("score").desc, col("mdoc")).limit(5)
        .select("mdoc").collect().map(_.getLong(0)).toSeq
      assert(fGot == fExact, s"$fGot vs $fExact")
      // guards: ascending order and a non-deterministic predicate keep
      // the exact plan
      val asc = docs.orderBy(MultiVec.maxsimCol(col("toks"), qm)).limit(5)
      assert(asc.queryExecution.optimizedPlan.collect {
        case m: MaxSimIdsLogical => m }.isEmpty)
      val nondet = docs.where(rand(3) > 0.5)
        .orderBy(MultiVec.maxsimCol(col("toks"), qm).desc).limit(5)
      assert(nondet.queryExecution.optimizedPlan.collect {
        case m: MaxSimIdsLogical => m }.isEmpty)
    } finally AnnCatalog.unregister(spark, s"$base/docs")
    // unregistered tables never rewrite
    val un = spark.read.parquet(s"$base/docs")
      .orderBy(MultiVec.maxsimCol(col("toks"), qm).desc).limit(5)
    assert(un.queryExecution.optimizedPlan.collect {
      case m: MaxSimIdsLogical => m }.isEmpty)
  }

  test("lateral maxsim joins through AnnKnnJoin kind=multivec; distributed path same") {
    import graft.ops.MultiVec
    val dir = sf("sf0.001")
    val toks = MultiVec.tokens(Tables.embeddings(spark, dir),
      "vec_id", "embedding", 4)
    val base = java.nio.file.Files.createTempDirectory("graft-mvlj").toString
    val corpus = toks.where(col("mdoc") >= 3)
    MultiVec.writeIndex(corpus, s"$base/idx", nlists = 8)
    MultiVec.docArrays(corpus).write.parquet(s"$base/docs")
    val docs = spark.read.parquet(s"$base/docs")
    val nDocs = docs.count().toInt
    // every list probed + candidate budget = corpus ⇒ EXACT answers
    AnnCatalog.register(spark, s"$base/docs", AnnCatalog.IndexMeta(
      s"$base/idx", "mdoc", "toks", "maxsim",
      ef = nDocs, kind = "multivec", nprobe = 8))
    MultiVec.docArrays(toks.where(col("mdoc") < 3))
      .select(col("mdoc").as("q_mdoc"), col("toks").as("qtoks"))
      .createOrReplaceTempView("graft_mvlj_probes")
    docs.createOrReplaceTempView("graft_mvlj_docs")
    try {
      val sqlText =
        """SELECT p.q_mdoc AS query_id, t.mdoc AS neighbor_id
          |FROM graft_mvlj_probes p,
          |LATERAL (
          |  SELECT mdoc FROM graft_mvlj_docs
          |  ORDER BY maxsim_score(toks, p.qtoks) DESC LIMIT 5
          |) t""".stripMargin
      val q = spark.sql(sqlText)
      assert(q.queryExecution.optimizedPlan.collect {
        case a: AnnKnnJoinLogical if a.kind == "multivec" => a
      }.nonEmpty)
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // exact per-probe truth via the doc-array kernel
      val exact = (0L until 3L).flatMap { qd =>
        val qm = MultiVec.queryToks(toks, Seq(qd)).map(_._3)
        MultiVec.scoreDocs(docs, qm)
          .orderBy(col("score").desc, col("mdoc")).limit(5)
          .select("mdoc").collect().map(r => (qd, r.getLong(0)))
      }.toSet
      assert(got == exact, s"got $got vs $exact")
      // over-budget probe side auto-routes to the distributed chunked
      // path (matrix probes packed executor-side) and returns the same
      val budgetKey = graft.GraftConf.KnnJoinBroadcastBytes
      spark.conf.set(budgetKey, "512")
      try {
        val distGot = spark.sql(sqlText).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(distGot == exact, s"distributed $distGot vs $exact")
      } finally spark.conf.unset(budgetKey)
    } finally {
      AnnCatalog.unregister(spark, s"$base/docs")
      spark.catalog.dropTempView("graft_mvlj_probes")
      spark.catalog.dropTempView("graft_mvlj_docs")
      ()
    }
  }

  test("lateral sparse joins through AnnKnnJoin kind=sparse; distributed path same") {
    import graft.ops.SparseSearch
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val sv = e.where(col("vec_id") =!= 0)
      .select(col("vec_id"), SparseSearch.sparsify(col("embedding"), 0.125f).as("sv"))
    val base = java.nio.file.Files.createTempDirectory("graft-splj").toString
    sv.write.parquet(s"$base/docs")
    SparseSearch.writePostings(
      SparseSearch.postings(sv, "vec_id", col("sv")), s"$base/post", buckets = 8)
    AnnCatalog.register(spark, s"$base/docs", AnnCatalog.IndexMeta(
      s"$base/post", "vec_id", "sv", "sparsedot", ef = 32, kind = "sparse"))
    e.where(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"),
        SparseSearch.sparsify(col("embedding"), 0.125f).as("qsv"))
      .createOrReplaceTempView("graft_splj_probes")
    spark.read.parquet(s"$base/docs").createOrReplaceTempView("graft_splj_docs")
    try {
      val sqlText =
        """SELECT p.q_id AS query_id, t.vec_id AS neighbor_id
          |FROM graft_splj_probes p,
          |LATERAL (
          |  SELECT vec_id FROM graft_splj_docs
          |  ORDER BY sparse_dot(sv, p.qsv) DESC LIMIT 5
          |) t""".stripMargin
      val q = spark.sql(sqlText)
      assert(q.queryExecution.optimizedPlan.collect {
        case a: AnnKnnJoinLogical if a.kind == "sparse" => a
      }.nonEmpty)
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // exact per-probe truth via the row-wise exact path
      val exact = (0L until 3L).flatMap { qd =>
        val qRow = e.where(col("vec_id") === qd)
          .select(SparseSearch.sparsify(col("embedding"), 0.125f))
          .head().getStruct(0)
        val ql = SparseSearch.queryLit(qRow.getSeq[Int](0), qRow.getSeq[Float](1))
        SparseSearch.topK(spark.read.parquet(s"$base/docs"), "vec_id",
            col("sv"), ql, 5)
          .select("vec_id").collect().map(r => (qd, r.getLong(0)))
      }.toSet
      assert(got == exact, s"got $got vs $exact")
      // over-budget probe sides pack the STRUCT probes executor-side
      // on the distributed chunked path and return the same join
      val budgetKey = graft.GraftConf.KnnJoinBroadcastBytes
      spark.conf.set(budgetKey, "64")
      try {
        val distGot = spark.sql(sqlText).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(distGot == exact, s"distributed $distGot vs $exact")
      } finally spark.conf.unset(budgetKey)
    } finally {
      AnnCatalog.unregister(spark, s"$base/docs")
      spark.catalog.dropTempView("graft_splj_probes")
      spark.catalog.dropTempView("graft_splj_docs")
      ()
    }
  }

  test("sparse kind: sparse_dot DESC rewrite = pruned inverted pre-rank, bit-equal") {
    import graft.ops.SparseSearch
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val sv = e.where(col("vec_id") =!= 0)
      .select(col("vec_id"), SparseSearch.sparsify(col("embedding"), 0.125f).as("sv"))
    val base = java.nio.file.Files.createTempDirectory("graft-spp").toString
    sv.write.parquet(s"$base/docs")
    SparseSearch.writePostings(
      SparseSearch.postings(sv, "vec_id", col("sv")), s"$base/post", buckets = 8)
    val qRow = e.where(col("vec_id") === 0)
      .select(SparseSearch.sparsify(col("embedding"), 0.125f).as("qv"))
      .head().getStruct(0)
    val q = SparseSearch.queryLit(qRow.getSeq[Int](0), qRow.getSeq[Float](1))
    val docs = spark.read.parquet(s"$base/docs")
    AnnCatalog.register(spark, s"$base/docs", AnnCatalog.IndexMeta(
      s"$base/post", "vec_id", "sv", "sparsedot", ef = 32, kind = "sparse"))
    try {
      val knn = docs
        .orderBy(sparse_dot(col("sv"), q).desc, col("vec_id")).limit(5)
      val opt = knn.queryExecution.optimizedPlan
      assert(opt.collect { case m: SparseAnnIdsLogical => m }.nonEmpty,
        opt.toString.take(800))
      // the rescore is the same exact score ⇒ full equality, same order
      val got = knn.select("vec_id").collect().map(_.getLong(0)).toSeq
      val exact = SparseSearch.topK(docs, "vec_id", col("sv"), q, 5)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(got == exact, s"$got vs $exact")
      // tombstoned docs never surface through the planner path either
      SparseSearch.deletePostings(spark, s"$base/post", Seq(got.head))
      val afterDel = docs
        .orderBy(sparse_dot(col("sv"), q).desc, col("vec_id")).limit(5)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(!afterDel.contains(got.head) && afterDel.nonEmpty)
      // single-order form (no id tiebreak) rewrites too
      val single = docs.orderBy(sparse_dot(col("sv"), q).desc).limit(5)
      assert(single.queryExecution.optimizedPlan.collect {
        case m: SparseAnnIdsLogical => m }.nonEmpty)
      // FILTERED form fires too and stays exact: the survivor
      // semi-join before the fold IS the exact filtered ranking
      val filtered = docs.where(col("vec_id") % 3 === 1)
        .orderBy(sparse_dot(col("sv"), q).desc, col("vec_id")).limit(5)
      assert(filtered.queryExecution.optimizedPlan.collect {
        case m: SparseAnnIdsLogical if m.pred.isDefined => m }.nonEmpty)
      val fGot = filtered.select("vec_id").collect().map(_.getLong(0)).toSeq
      // (got.head was tombstoned above — exclude it from the truth too)
      val fExact = SparseSearch.topK(
          docs.where(col("vec_id") % 3 === 1 && col("vec_id") =!= got.head),
          "vec_id", col("sv"), q, 5)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(fGot == fExact, s"$fGot vs $fExact")
      // guards: ascending order, a non-deterministic predicate, and a
      // non-id second sort key all keep the exact plan
      val asc = docs.orderBy(sparse_dot(col("sv"), q)).limit(5)
      assert(asc.queryExecution.optimizedPlan.collect {
        case m: SparseAnnIdsLogical => m }.isEmpty)
      val nondet = docs.where(rand(7) > 0.5)
        .orderBy(sparse_dot(col("sv"), q).desc).limit(5)
      assert(nondet.queryExecution.optimizedPlan.collect {
        case m: SparseAnnIdsLogical => m }.isEmpty)
      val badTie = docs
        .orderBy(sparse_dot(col("sv"), q).desc, col("vec_id").desc).limit(5)
      assert(badTie.queryExecution.optimizedPlan.collect {
        case m: SparseAnnIdsLogical => m }.isEmpty)
      // starvation: k above the positive-score count falls back to the
      // exact scan — zero-overlap rows fill (minus the one doc
      // tombstoned above, which the fallback must keep masking)
      val nPos = docs.select(sparse_dot(col("sv"), q).as("s"))
        .where(col("s") > 0).count()
      val n = docs.count()
      if (n > nPos) {
        val kAll = math.min(n, 1000).toInt
        val all = docs
          .orderBy(sparse_dot(col("sv"), q).desc, col("vec_id")).limit(kAll)
        assert(all.queryExecution.optimizedPlan.collect {
          case m: SparseAnnIdsLogical => m }.nonEmpty)
        assert(all.count() == kAll - 1) // all live docs, tombstone masked
        assert(!all.select("vec_id").collect().map(_.getLong(0))
          .contains(got.head))
      }
    } finally AnnCatalog.unregister(spark, s"$base/docs")
    // unregistered tables never rewrite
    val un = spark.read.parquet(s"$base/docs")
      .orderBy(sparse_dot(col("sv"), q).desc).limit(5)
    assert(un.queryExecution.optimizedPlan.collect {
      case m: SparseAnnIdsLogical => m }.isEmpty)
  }

  test("lateral rule guards: wrong output shape or oversized k keep failing analysis") {
    import graft.ann.{AnnIndex, AnnParams}
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val path = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-latneg").toFile, "idx").toString
    AnnIndex.build(e, "vec_id", "embedding", path,
      AnnParams(m = 8, efConstruction = 64, ef = 64, numPartitions = 2))
    val tablePath = s"$dir/embeddings.parquet"
    spark.read.parquet(tablePath).createOrReplaceTempView("emb_latneg")
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = 64))
    try {
      def lateral(select: String, limit: Int) =
        s"""SELECT p.vec_id AS qid FROM
           |(SELECT vec_id, embedding FROM emb_latneg WHERE vec_id < 2) p,
           |LATERAL (
           |  SELECT $select FROM emb_latneg
           |  ORDER BY l2sq_dist(embedding, p.embedding) LIMIT $limit
           |) t""".stripMargin
      // the guarded shape works
      assert(spark.sql(lateral("vec_id", 2)).collect().nonEmpty)
      // extra output column → rule must NOT fire → vanilla rejection
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(lateral("vec_id, label", 2)).collect()
      }
      // non-id output column → same
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(lateral("label", 2)).collect()
      }
      // k beyond the planner bound → same
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(lateral("vec_id", 5000)).collect()
      }
    } finally {
      AnnCatalog.unregister(spark, tablePath)
      spark.catalog.dropTempView("emb_latneg")
      ()
    }
  }

  test("weighted ORDER BY w1*dist+w2*dist routes through WeightedAnnIds") {
    import graft.ann.{AnnIndex, AnnParams}
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val q2 = e.where(col("vec_id") === 1).select("embedding")
      .head().getSeq[Float](0).toArray
    val tmp = java.nio.file.Files.createTempDirectory("graft-wplan").toFile
    val p1 = new java.io.File(tmp, "l2").toString
    val p2 = new java.io.File(tmp, "cos").toString
    AnnIndex.build(e, "vec_id", "embedding", p1,
      AnnParams(m = 8, efConstruction = 64, ef = 64, numPartitions = 2))
    AnnIndex.build(e, "vec_id", "embedding", p2,
      AnnParams(m = 8, efConstruction = 64, ef = 64, metric = "cos", numPartitions = 2))
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(p1, "vec_id", "embedding", "l2sq", ef = 64))
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(p2, "vec_id", "embedding", "cos", ef = 64))
    try {
      def joint(w1: Double) =
        lit(w1) * l2sq_dist(col("embedding"), lit(q)) +
          lit(0.3) * cos_dist(col("embedding"), lit(q2))
      val knn = e.orderBy(joint(0.7)).limit(10)
      assert(knn.queryExecution.optimizedPlan.collect {
        case w: WeightedAnnIdsLogical => w
      }.nonEmpty, knn.queryExecution.optimizedPlan.toString)
      val got = knn.select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = e.withColumn("d", joint(0.7))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got.intersect(exact).size >= 8, s"recall too low: $got vs $exact")

      // a NEGATIVE weight inverts a term's ordering — nearest-candidate
      // unions are biased exactly wrong, so the rewrite must not fire
      val neg = e.orderBy(joint(-0.7)).limit(10)
      assert(neg.queryExecution.optimizedPlan.collect {
        case w: WeightedAnnIdsLogical => w
      }.isEmpty)

      // a term without a registered index (hamming etc.) keeps exact
      val unidx = e.orderBy(
        lit(0.7) * l2sq_dist(col("embedding"), lit(q)) +
          lit(0.3) * l2sq_dist(reverse(col("embedding")), lit(q2))).limit(10)
      assert(unidx.queryExecution.optimizedPlan.collect {
        case w: WeightedAnnIdsLogical => w
      }.isEmpty)
    } finally AnnCatalog.unregister(spark, tablePath)
  }

  test("planner fires through Filter for IVF indexes too (kind routed)") {
    import graft.ann.IvfIndex
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val path = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-ivffplan").toFile, "idx").toString
    IvfIndex.build(e, "vec_id", "embedding", path, nlists = 4)
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = 64,
        kind = "ivf", nprobe = 2))
    try {
      val q = e.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).toArray
      val pred = col("vec_id") % 3 === 0
      val knn = e.where(pred)
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      val nodes = knn.queryExecution.optimizedPlan.collect {
        case a: AnnFilteredIdsLogical => a
      }
      assert(nodes.nonEmpty && nodes.head.kind == "ivf",
        knn.queryExecution.optimizedPlan.toString)
      val got = knn.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got.forall(_ % 3 == 0))
      val exact = e.where(pred)
        .withColumn("d", l2sq_dist(col("embedding"), lit(q)))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got.intersect(exact).size >= 8, s"recall too low: $got vs $exact")

      // starving predicate: exact (nprobe widens to ALL lists, which
      // proves enumeration for IVF — or the exact fallback fires)
      val starved = e.where(col("vec_id") < 3)
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      assert(starved.select("vec_id").collect().map(_.getLong(0)).toSet
        == Set(0L, 1L, 2L))
    } finally AnnCatalog.unregister(spark, tablePath)
  }

  test("planner fires through Filter for PQ indexes (LUT candidates + true-float rerank)") {
    import graft.ann.{AnnParams, PqAnnIndex}
    import graft.pq.ProductQuantizer
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val path = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-pqfplan").toFile, "idx").toString
    val cb = ProductQuantizer.trainCodebook(
      e, "embedding", subvectors = 8, clusters = 16)
    PqAnnIndex.build(e, "vec_id", "embedding", path, cb,
      AnnParams(m = 8, efConstruction = 64, ef = 64, numPartitions = 2))
    val tablePath = s"$dir/embeddings.parquet"
    // deep LUT pool: sub-byte ADC noise on near-random data needs a
    // wide candidate set before the true-float rerank (same ef the
    // ivfpq recall gate uses)
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = 256,
        kind = "pq"))
    try {
      val q = e.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).toArray
      val pred = col("vec_id") % 3 === 0
      val knn = e.where(pred)
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      val nodes = knn.queryExecution.optimizedPlan.collect {
        case a: AnnFilteredIdsLogical => a
      }
      assert(nodes.nonEmpty && nodes.head.kind == "pq",
        knn.queryExecution.optimizedPlan.toString)
      val got = knn.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got.forall(_ % 3 == 0))
      val exact = e.where(pred)
        .withColumn("d", l2sq_dist(col("embedding"), lit(q)))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got.intersect(exact).size >= 7, s"recall too low: $got vs $exact")

      val starved = e.where(col("vec_id") < 3)
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(10)
      assert(starved.select("vec_id").collect().map(_.getLong(0)).toSet
        == Set(0L, 1L, 2L))
    } finally AnnCatalog.unregister(spark, tablePath)
  }

  test("SQL surface: extension-injected functions work in spark.sql and match the DSL") {
    // NOT calling registerAll — GraftExtensions must have injected them
    val dir = sf("sf0.001")
    spark.read.parquet(s"$dir/embeddings.parquet").createOrReplaceTempView("emb")
    val viaSql = spark.sql(
      """SELECT vec_id, l2sq_dist(embedding, (SELECT first(embedding) FROM emb WHERE vec_id = 0)) AS d
        |FROM emb ORDER BY d, vec_id LIMIT 5""".stripMargin).collect()
    val e = Tables.embeddings(spark, dir)
    val q = e.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val viaDsl = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
      .orderBy(col("d"), col("vec_id")).limit(5).collect()
    assert(viaSql.map(_.getLong(0)).toSeq === viaDsl.map(_.getLong(0)).toSeq)
  }

  test("SQL surface: text + quantization functions are injected") {
    val r = spark.sql(
      """SELECT tokenize('Hello, World!') AS t,
        |  text_to_stem_array('running the queries') AS st,
        |  language_id('der hund und die katze') AS lang,
        |  punct_ratio('a,b!') AS pr,
        |  quantize_i8(unit_normalize(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))) AS q8,
        |  quantize_b1(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT))) AS qb,
        |  dequantize_f16(quantize_f16(array(CAST(0.5 AS FLOAT)))) AS f16rt
        |""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("hello", "world"))
    assert(r.getSeq[String](1) == Seq("run", "queri"))
    assert(r.getString(2) == "de")
    assert(r.getDouble(3) == 0.5)
    assert(r.getSeq[Byte](4).toArray.sameElements(
      graft.pq.ScalarQuantizer.quantizeI8(Array(0.6f, 0.8f))))
    assert(r.getSeq[Int](5) == Seq(Integer.MIN_VALUE >>> 0)) // MSB set only
    assert(r.getSeq[Float](6) == Seq(0.5f))
  }
}
