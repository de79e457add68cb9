package graft.ann

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.l2sq_dist
import graft.plans.{AnnCatalog, AnnScanExec}

class AnnSpec extends SparkTestBase {

  private def randomVecs(n: Int, dim: Int, seed: Long): Array[(Long, Array[Float])] = {
    val rng = new java.util.Random(seed)
    Array.tabulate(n)(i => (i.toLong, Array.fill(dim)(rng.nextFloat() * 2 - 1)))
  }

  private def bruteTopK(
      data: Array[(Long, Array[Float])], q: Array[Float], k: Int, metric: Int): Seq[Long] =
    data.map { case (id, v) => (id, Metric.dist(metric, q, v)) }
      .sortBy(x => (x._2, x._1)).take(k).map(_._1).toSeq

  private def recall(got: Seq[Long], truth: Seq[Long]): Double =
    got.toSet.intersect(truth.toSet).size.toDouble / truth.size

  // ----------------------------------------------------- in-memory graph

  test("HnswGraph recall@10 >= 0.9 vs brute force (l2sq, 2000 x 32)") {
    val data = randomVecs(2000, 32, seed = 7)
    val g = new HnswGraph(32, m = 16, efConstruction = 128, Metric.L2Sq, seed = 1)
    data.foreach { case (id, v) => g.insert(id, v) }
    val queries = randomVecs(20, 32, seed = 99)
    val rs = queries.map { case (_, q) =>
      recall(g.search(q, 10, ef = 64).map(_._1).toSeq, bruteTopK(data, q, 10, Metric.L2Sq))
    }
    val avg = rs.sum / rs.length
    assert(avg >= 0.9, s"avg recall $avg")
  }

  test("HnswGraph cosine metric recall >= 0.9") {
    val data = randomVecs(1000, 16, seed = 3)
    val g = new HnswGraph(16, 16, 128, Metric.Cos, seed = 1)
    data.foreach { case (id, v) => g.insert(id, v) }
    val q = randomVecs(1, 16, seed = 55)(0)._2
    val r = recall(g.search(q, 10, 64).map(_._1).toSeq, bruteTopK(data, q, 10, Metric.Cos))
    assert(r >= 0.9, s"recall $r")
  }

  test("validate reports (not throws) on corrupt entry point") {
    val g = new HnswGraph(2, 8, 64, Metric.L2Sq, seed = 1)
    g.insert(1L, Array(0f, 0f))
    g.entryPoint = 5 // corrupt
    val errs = g.validate()
    assert(errs.exists(_.contains("entry point 5 out of range")))
  }

  test("HnswGraph validate() finds no violations; ser/de roundtrip identical") {
    val data = randomVecs(500, 8, seed = 11)
    val g = new HnswGraph(8, 8, 64, Metric.L2Sq, seed = 2)
    data.foreach { case (id, v) => g.insert(id, v) }
    assert(g.validate().isEmpty)
    val g2 = HnswGraph.fromBytes(g.toBytes)
    assert(g2.size === g.size)
    assert(g2.validate().isEmpty)
    val q = randomVecs(1, 8, seed = 77)(0)._2
    assert(g2.search(q, 10, 64).toSeq === g.search(q, 10, 64).toSeq)
  }

  test("HnswGraph dim mismatch raises; tombstone masking skips labels") {
    val g = new HnswGraph(4, 8, 64, Metric.L2Sq, seed = 1)
    g.insert(1L, Array(1f, 0f, 0f, 0f))
    intercept[IllegalArgumentException] { g.insert(2L, Array(1f, 0f)) }
    g.insert(2L, Array(0f, 1f, 0f, 0f))
    val res = g.search(Array(1f, 0f, 0f, 0f), 2, 16, banned = _ == 1L)
    assert(res.map(_._1).toSeq === Seq(2L))
  }

  // ----------------------------------------------------- distributed index

  test("AnnIndex build/search on embeddings: recall@10 >= 0.8 vs exact") {
    val dir = sf("sf0.001")
    val path = Files.createTempDirectory("graft-ann").toString + "/idx"
    val e = Tables.embeddings(spark, dir)
    AnnIndex.build(e, "vec_id", "embedding", path,
      AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))

    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val ann = AnnIndex.search(spark, path, q, 10).map(_._1).toSeq
    val exact = e.withColumn("d", l2sq_dist(col("embedding"), lit(q)))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(recall(ann, exact) >= 0.8)
    assert(AnnIndex.validate(spark, path).count() === 0)
  }

  test("searchFiltered: predicate respected, high recall, starvation falls back exact") {
    val dir = sf("sf0.001")
    val path = Files.createTempDirectory("graft-annf").toString + "/idx"
    val e = Tables.embeddings(spark, dir)
    AnnIndex.build(e, "vec_id", "embedding", path,
      AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray

    // 1-in-3 predicate: every hit passes it, recall vs exact filtered
    val pred = col("vec_id") % 3 === 0
    val got = AnnIndex.searchFiltered(e, "vec_id", "embedding", path, q, 10, pred)
    assert(got.forall(_._1 % 3 == 0), got.toSeq)
    assert(got.length == 10)
    // nearest-first ordering
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)
    val exactF = e.where(pred)
      .withColumn("d", l2sq_dist(col("embedding"), lit(q)))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(recall(got.map(_._1).toSeq, exactF) >= 0.8)

    // predicate keeping < k rows: MUST return exactly those (the exact
    // fallback — a fixed candidate set would starve here)
    val starved = AnnIndex.searchFiltered(
      e, "vec_id", "embedding", path, q, 10, col("vec_id") < 3)
    assert(starved.map(_._1).toSet ==
      e.where(col("vec_id") < 3).select("vec_id").collect().map(_.getLong(0)).toSet)

    // the exact fallback (forced via maxRounds = 0) must subtract
    // tombstones — a deleted row may never resurface through a filter
    AnnIndex.delete(spark, path, Seq(0L))
    val afterDelete = AnnIndex.searchFiltered(
      e, "vec_id", "embedding", path, q, 10, col("vec_id") < 3, maxRounds = 0)
    assert(!afterDelete.map(_._1).contains(0L), afterDelete.toSeq)
    assert(afterDelete.map(_._1).toSet ==
      e.where(col("vec_id") < 3 && col("vec_id") =!= 0)
        .select("vec_id").collect().map(_.getLong(0)).toSet)
    // and the adaptive/exhaustion path masks them too
    val adaptive = AnnIndex.searchFiltered(
      e, "vec_id", "embedding", path, q, 10, col("vec_id") < 3)
    assert(!adaptive.map(_._1).contains(0L), adaptive.toSeq)
  }

  test("AnnIndex append adds searchable rows; delete tombstones them") {
    val path = Files.createTempDirectory("graft-ann2").toString + "/idx"
    import spark.implicits._
    val base = (0 until 100).map(i => (i.toLong, Array.fill(8)(i.toFloat / 100)))
      .toDF("id", "vec")
    AnnIndex.build(base, "id", "vec", path, AnnParams(m = 8, numPartitions = 2))

    // aminsert analog: delta shard
    val delta = Seq((1000L, Array.fill(8)(9.9f))).toDF("id", "vec")
    AnnIndex.append(delta, "id", "vec", path)
    val q = Array.fill(8)(9.9f)
    assert(AnnIndex.search(spark, path, q, 1).head._1 === 1000L)

    // ambulkdelete analog: masked, not removed
    AnnIndex.delete(spark, path, Seq(1000L))
    assert(AnnIndex.search(spark, path, q, 1).head._1 !== 1000L)

    // consolidate rebuilds without tombstoned rows
    AnnIndex.consolidate(spark, path, numPartitions = 2)
    assert(AnnIndex.vectors(spark, path).count() === 100)
    assert(AnnIndex.search(spark, path, q, 1).head._1 !== 1000L)
  }

  // ----------------------------------------------------- planner rule

  test("orderBy(dist).limit(k) over registered table uses AnnScanExec, unregistered does not") {
    val dir = sf("sf0.001")
    val tmp = Files.createTempDirectory("graft-ann3").toString
    val path = s"$tmp/idx"
    val e = Tables.embeddings(spark, dir)
    AnnIndex.build(e, "vec_id", "embedding", path, AnnParams(numPartitions = 2))
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray

    // check the optimized logical plan: AQE wraps the physical tree, so
    // executedPlan.collect would not descend into it
    def hasAnn(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case a: graft.plans.AnnScanLogical => a
      }.nonEmpty

    // def, not val: queryExecution memoizes the plan per DataFrame, and
    // the rewrite decision must be re-made after registration
    def knn = e.select(col("vec_id"), col("embedding"))
      .orderBy(l2sq_dist(col("embedding"), lit(q)))
      .limit(10)

    assert(!hasAnn(knn), "must not rewrite before registration")
    val exact = knn.select("vec_id").collect().map(_.getLong(0)).toSeq

    AnnCatalog.register(spark, s"$dir/embeddings.parquet",
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq", ef = 64))
    try {
      assert(hasAnn(knn), "registered table + orderBy(dist)+limit must use ANN scan")
      val annRows = knn.select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(recall(annRows, exact) >= 0.8)

      // projection beyond (id, vec) → join-back form, still ANN-driven
      val wide = e.orderBy(l2sq_dist(col("embedding"), lit(q))).limit(5)
        .select("vec_id", "label")
      assert(hasAnn(wide))
      assert(wide.count() === 5)

      // pure-SQL path: constant-folded array literal must also rewrite
      e.createOrReplaceTempView("graft_ann_emb")
      val qSql = q.map(x => s"CAST($x AS FLOAT)").mkString("array(", ",", ")")
      val sqlKnn = spark.sql(
        s"""SELECT vec_id, embedding FROM graft_ann_emb
           |ORDER BY l2sq_dist(embedding, $qSql) LIMIT 10""".stripMargin)
      assert(hasAnn(sqlKnn), "SQL ORDER BY dist LIMIT must use ANN scan")
      assert(recall(sqlKnn.select("vec_id").collect().map(_.getLong(0)).toSeq,
        exact) >= 0.8)

      // a filter between sort and scan must NOT rewrite (semantics guard)
      val filtered = e.where(col("label") > 100)
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(5)
      assert(!hasAnn(filtered))

      // no order-by → no index (cost = infinity analog, hnsw.c:164-172)
      assert(!hasAnn(e.limit(5)))
    } finally AnnCatalog.unregister(spark, s"$dir/embeddings.parquet")
  }

  test("tombstone mask: bloom variant never resurrects a deleted id") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.001)
    (0L until 1000L).foreach(bf.putLong)
    val mask = AnnIndex.BloomTombstones(bf)
    // no false negatives: every deleted id stays banned
    assert((0L until 1000L).forall(mask.banned))
    // false positives are rare (recall haircut only)
    val fp = (100000L until 110000L).count(mask.banned)
    assert(fp < 100, s"fp=$fp")
    assert(!AnnIndex.NoTombstones.banned(1L))
    assert(AnnIndex.ExactTombstones(Set(5L)).banned(5L))
    assert(!AnnIndex.ExactTombstones(Set(5L)).banned(6L))
  }
}
