package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.{MatVecProject, MaxSimScore}
import org.apache.spark.sql.graftshim.GraftSqlShim

class MultiVecSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def rng(seed: Long) = new scala.util.Random(seed)

  /** Local-fs path of the postings dir currently SERVING `dir` — after
    * a consolidate that is the committed generation, not `postings`. */
  private def served(dir: String): String =
    new java.net.URI(MultiVec.postingsDir(spark, dir)).getPath

  /** Deterministic little corpus: nDocs docs × tpd tokens × dim floats. */
  private def corpus(nDocs: Int, tpd: Int, dim: Int, seed: Long = 7L) = {
    val r = rng(seed)
    (0 until nDocs).flatMap { d =>
      (0 until tpd).map { t =>
        (d.toLong, t, Array.fill(dim)(r.nextFloat() * 2f - 1f))
      }
    }
  }

  private def naiveMaxSim(doc: Seq[Array[Float]], q: Seq[Array[Float]]): Double =
    q.map { qv =>
      doc.map { tv =>
        var s = 0.0; var j = 0
        while (j < qv.length) { s += qv(j).toDouble * tv(j); j += 1 }
        s
      }.max
    }.sum

  test("MaxSimScore matches the naive definition") {
    val r = rng(1L)
    val doc = Seq.fill(5)(Array.fill(8)(r.nextFloat() - 0.5f))
    val q = Seq.fill(3)(Array.fill(8)(r.nextFloat() - 0.5f))
    val got = spark.createDataset(Seq(doc.map(_.toSeq)))
      .select(GraftSqlShim.column(MaxSimScore(
        GraftSqlShim.expression(col("value").cast("array<array<float>>")),
        q.map(_.map(_.toDouble)).toArray)).as("s"))
      .head().getDouble(0)
    assert(got === naiveMaxSim(doc, q))
  }

  test("MaxSimScoreCol (column query) is bit-identical to the literal form") {
    val r = rng(2L)
    val doc = Seq.fill(6)(Array.fill(8)(r.nextFloat() - 0.5f))
    val q = Seq.fill(4)(Array.fill(8)(r.nextFloat() - 0.5f))
    val df = spark.createDataset(Seq((doc.map(_.toSeq), q.map(_.toSeq))))
      .select(col("_1").cast("array<array<float>>").as("toks"),
        col("_2").cast("array<array<float>>").as("qtoks"))
    val viaCol = df.select(GraftSqlShim.column(graft.functions.MaxSimScoreCol(
        GraftSqlShim.expression(col("toks")),
        GraftSqlShim.expression(col("qtoks")))).as("s"))
      .head().getDouble(0)
    val viaLit = df.select(GraftSqlShim.column(MaxSimScore(
        GraftSqlShim.expression(col("toks")),
        q.map(_.map(_.toDouble)).toArray)).as("s"))
      .head().getDouble(0)
    assert(viaCol == viaLit && viaCol == naiveMaxSim(doc, q))
    // and through the SQL registration
    df.createOrReplaceTempView("graft_mvcol")
    val viaSql = spark.sql(
      "SELECT maxsim_score(toks, qtoks) AS s FROM graft_mvcol")
      .head().getDouble(0)
    assert(viaSql == viaLit)
  }

  test("flat path and doc-array path produce bit-identical scores") {
    val rows = corpus(nDocs = 12, tpd = 4, dim = 16)
    val toks = rows.map { case (d, t, v) => (d, t, v.toSeq) }
      .toDF("mdoc", "t_idx", "tok")
      .withColumn("tok", col("tok").cast("array<float>"))
    val qToks = rows.filter(_._1 == 0L).sortBy(_._2)
      .map { case (d, t, v) => (d, t, v) }.toArray
    val docs = toks.where(col("mdoc") =!= 0)
    val flat = MultiVec.scoreFlat(docs, qToks)
      .select("mdoc", "score").as[(Long, Double)].collect().toMap
    val viaArrays = MultiVec.scoreDocs(
        MultiVec.docArrays(docs), qToks.map(_._3))
      .select("mdoc", "score").as[(Long, Double)].collect().toMap
    assert(flat === viaArrays)
    // and both match the naive definition exactly
    val byDoc = rows.filter(_._1 != 0L).groupBy(_._1)
    byDoc.foreach { case (d, ts) =>
      assert(flat(d) === naiveMaxSim(ts.sortBy(_._2).map(_._3), qToks.map(_._3)))
    }
  }

  test("MaxSimScore raises on empty docs and mismatched dims") {
    val q = Array(Array(1.0, 2.0))
    val empty = intercept[Exception] {
      spark.createDataset(Seq(Seq.empty[Seq[Float]]))
        .select(GraftSqlShim.column(MaxSimScore(
          GraftSqlShim.expression(col("value").cast("array<array<float>>")), q)))
        .collect()
    }
    assert(empty.getMessage.contains("empty document token array"))
    val mismatch = intercept[Exception] {
      spark.createDataset(Seq(Seq(Seq(1f, 2f, 3f))))
        .select(GraftSqlShim.column(MaxSimScore(
          GraftSqlShim.expression(col("value").cast("array<array<float>>")), q)))
        .collect()
    }
    assert(mismatch.getMessage.toLowerCase.contains("dim"))
  }

  test("plaid with every centroid probed and a full candidate budget is exact") {
    val rows = corpus(nDocs = 20, tpd = 4, dim = 16, seed = 3L)
    val toks = rows.map { case (d, t, v) => (d, t, v.toSeq) }
      .toDF("mdoc", "t_idx", "tok")
      .withColumn("tok", col("tok").cast("array<float>"))
    val qToks = rows.filter(_._1 <= 1L).sortBy(t => (t._1, t._2)).toArray
    val docs = toks.where(col("mdoc") > 1)
    val cents = MultiVec.trainCentroids(toks, 4, seed = 5L)
    val assigned = MultiVec.assign(docs, cents)
    // probe everything: stage-1 approximation sees every token, so the
    // candidate ORDER may differ slightly (i8 rounding) but a full
    // budget forwards every doc to the exact rerank
    val probes = Map(0L -> cents.indices.toSet, 1L -> cents.indices.toSet)
    val got = MultiVec.topKPerQuery(
      MultiVec.plaidSearch(assigned, qToks, probes, candPerQuery = 100), 5)
    val want = MultiVec.topKPerQuery(MultiVec.scoreFlat(docs, qToks), 5)
    assert(got.collect().toSet === want.collect().toSet)
  }

  test("on-disk postings prune to probed centroids and skip the vector column") {
    val rows = corpus(nDocs = 20, tpd = 4, dim = 16, seed = 9L)
    val toks = rows.map { case (d, t, v) => (d, t, v.toSeq) }
      .toDF("mdoc", "t_idx", "tok")
      .withColumn("tok", col("tok").cast("array<float>"))
    val cents = MultiVec.trainCentroids(toks, 4, seed = 5L)
    val assigned = MultiVec.assign(toks, cents)
    val dir = java.nio.file.Files.createTempDirectory("mv-post").toString + "/p"
    MultiVec.writeTokenPostings(assigned, dir)

    val pruned = MultiVec.readTokenPostings(spark, dir, Seq(0, 2))
      .select("mdoc", "cent", "tok_i8")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cent"), plan)
    assert(!plan.contains("tok#") || plan.contains("tok_i8"), plan)
    // the stage-1 scan must not read the float vector column
    assert(!plan.contains("ReadSchema") ||
      !plan.split("ReadSchema")(1).takeWhile(_ != '\n').contains("tok:"), plan)
    assert(pruned.select("cent").distinct().as[Int].collect().toSet === Set(0, 2))

    // disk path == in-memory path, bit-for-bit
    val qToks = rows.filter(_._1 == 0L).sortBy(_._2).toArray
    val corpusOnly = assigned.where(col("mdoc") =!= 0)
    val dirC = java.nio.file.Files.createTempDirectory("mv-post").toString + "/c"
    MultiVec.writeTokenPostings(corpusOnly, dirC)
    val probes = MultiVec.probeSets(qToks, cents, 2)
    val disk = MultiVec.topKPerQuery(
      MultiVec.plaidSearchOnDisk(spark, dirC, qToks, probes, 8), 5).collect().toSet
    val mem = MultiVec.topKPerQuery(
      MultiVec.plaidSearch(corpusOnly, qToks, probes, 8), 5).collect().toSet
    assert(disk === mem && disk.nonEmpty)
  }

  test("appendToIndex extends the index; deleteDocs masks search results") {
    val rows = corpus(nDocs = 16, tpd = 4, dim = 16, seed = 11L)
    def toksOf(p: Long => Boolean) =
      rows.filter(r => p(r._1)).map { case (d, t, v) => (d, t, v.toSeq) }
        .toDF("mdoc", "t_idx", "tok")
        .withColumn("tok", col("tok").cast("array<float>"))
    val dir = java.nio.file.Files.createTempDirectory("mv-idx").toString + "/i"
    MultiVec.writeIndex(toksOf(d => d >= 1 && d <= 8), dir, nlists = 4, seed = 5L)
    MultiVec.appendToIndex(spark, dir, toksOf(d => d > 8))
    val qToks = rows.filter(_._1 == 0L).sortBy(_._2).toArray
    // appended postings score bit-identically to one-shot exact scoring
    val post = spark.read.parquet(s"$dir/postings")
    assert(post.count() == 15 * 4)
    val viaIndex = MultiVec.scoreFlat(post.select("mdoc", "t_idx", "tok"), qToks)
      .select("mdoc", "score").as[(Long, Double)].collect().toMap
    val direct = MultiVec.scoreFlat(toksOf(_ != 0L), qToks)
      .select("mdoc", "score").as[(Long, Double)].collect().toMap
    assert(viaIndex === direct)
    // streamed docs are findable through the index search
    val got = MultiVec.searchIndex(spark, dir, qToks, k = 15,
      nprobe = 4, candPerQuery = 20)
    assert(got.count() == 15)
    // tombstone the current best doc: it must vanish from results
    val best = got.orderBy(col("score").desc).head().getLong(1)
    MultiVec.deleteDocs(spark, dir, Seq(best))
    val after = MultiVec.searchIndex(spark, dir, qToks, k = 15,
      nprobe = 4, candPerQuery = 20)
      .select("mdoc").as[Long].collect().toSet
    assert(!after.contains(best) && after.nonEmpty)
    // a full rebuild starts clean: stale tombstones must not mask the
    // fresh postings
    MultiVec.writeIndex(toksOf(_ != 0L), dir, nlists = 4, seed = 5L)
    val rebuilt = MultiVec.searchIndex(spark, dir, qToks, k = 15,
      nprobe = 4, candPerQuery = 20)
      .select("mdoc").as[Long].collect().toSet
    assert(rebuilt.contains(best))
  }

  test("consolidateIndex compacts files, applies tombstones, resets them") {
    val rows = corpus(nDocs = 12, tpd = 4, dim = 16, seed = 13L)
    def toksOf(p: Long => Boolean) =
      rows.filter(r => p(r._1)).map { case (d, t, v) => (d, t, v.toSeq) }
        .toDF("mdoc", "t_idx", "tok")
        .withColumn("tok", col("tok").cast("array<float>"))
    val dir = java.nio.file.Files.createTempDirectory("mv-cons").toString + "/i"
    MultiVec.writeIndex(toksOf(d => d >= 1 && d <= 6), dir, nlists = 4, seed = 5L)
    MultiVec.appendToIndex(spark, dir, toksOf(_ > 6))
    MultiVec.deleteDocs(spark, dir, Seq(2L))
    MultiVec.consolidateIndex(spark, dir)
    // one file per centroid directory (in the committed generation now
    // serving), tombstones gone, the legacy dir retired
    val centDirs = new java.io.File(served(dir)).listFiles()
      .filter(_.getName.startsWith("cent="))
    assert(centDirs.nonEmpty && centDirs.forall(
      _.listFiles().count(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith(".")) == 1))
    assert(!new java.io.File(s"$dir/tombstones").exists())
    assert(!new java.io.File(s"$dir/postings").exists())
    // compacted postings score bit-identically to the live docs
    val qToks = rows.filter(_._1 == 0L).sortBy(_._2).toArray
    val got = MultiVec.scoreFlat(
        spark.read.parquet(served(dir)).select("mdoc", "t_idx", "tok"), qToks)
      .select("mdoc", "score").as[(Long, Double)].collect().toMap
    val want = MultiVec.scoreFlat(toksOf(d => d != 0L && d != 2L), qToks)
      .select("mdoc", "score").as[(Long, Double)].collect().toMap
    assert(got === want && !got.contains(2L))
  }

  test("consolidateIndex preserves tombstones appended during compaction") {
    val rows = corpus(nDocs = 10, tpd = 4, dim = 16, seed = 17L)
    def toksOf(p: Long => Boolean) =
      rows.filter(r => p(r._1)).map { case (d, t, v) => (d, t, v.toSeq) }
        .toDF("mdoc", "t_idx", "tok")
        .withColumn("tok", col("tok").cast("array<float>"))
    val dir = java.nio.file.Files.createTempDirectory("mv-race").toString + "/i"
    MultiVec.writeIndex(toksOf(_ >= 1), dir, nlists = 4, seed = 5L)
    MultiVec.deleteDocs(spark, dir, Seq(2L))
    val qToksEarly = rows.filter(_._1 == 0L).sortBy(_._2).toArray
    var sawInWindow = -1
    // a deleteDocs lands AFTER the snapshot/compaction, BEFORE the
    // commit — and a reader probes INSIDE the window where the old
    // two-rename swap had no postings dir at all: resolving through
    // the committed generation it must find complete data
    MultiVec.consolidateIndex(spark, dir,
      () => MultiVec.deleteDocs(spark, dir, Seq(3L)),
      beforeOldDelete = () => sawInWindow = MultiVec
        .searchIndex(spark, dir, qToksEarly, k = 10,
          nprobe = 4, candPerQuery = 20).select("mdoc").count().toInt)
    assert(sawInWindow > 0,
      "a reader inside the swap window must see complete postings")
    // doc 2 physically gone (snapshot applied); doc 3's LATE tombstone
    // survived — physically present but still masked in every search
    val post = spark.read.parquet(served(dir))
    assert(post.where(col("mdoc") === 2L).count() == 0)
    assert(post.where(col("mdoc") === 3L).count() > 0)
    assert(new java.io.File(s"$dir/tombstones").exists())
    val qToks = rows.filter(_._1 == 0L).sortBy(_._2).toArray
    val ids = MultiVec.searchIndex(spark, dir, qToks, k = 10,
        nprobe = 4, candPerQuery = 20)
      .select("mdoc").as[Long].collect().toSet
    assert(!ids.contains(2L) && !ids.contains(3L) && ids.nonEmpty)
    // the NEXT consolidation retires it physically too — and only ONE
    // committed generation remains (the previous one was deleted)
    MultiVec.consolidateIndex(spark, dir)
    assert(spark.read.parquet(served(dir))
      .where(col("mdoc") === 3L).count() == 0)
    assert(!new java.io.File(s"$dir/tombstones").exists())
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("postings_g")) == 1)
  }

  test("validateIndex passes on fresh/appended/consolidated; rejects corruption") {
    val rows = corpus(nDocs = 10, tpd = 4, dim = 16, seed = 19L)
    def toksOf(p: Long => Boolean) =
      rows.filter(r => p(r._1)).map { case (d, t, v) => (d, t, v.toSeq) }
        .toDF("mdoc", "t_idx", "tok")
        .withColumn("tok", col("tok").cast("array<float>"))
    val dir = java.nio.file.Files.createTempDirectory("mv-val").toString + "/i"
    MultiVec.writeIndex(toksOf(d => d >= 1 && d <= 5), dir, nlists = 4, seed = 5L)
    assert(MultiVec.validateIndex(spark, dir) == 5 * 4)
    MultiVec.appendToIndex(spark, dir, toksOf(_ > 5))
    MultiVec.deleteDocs(spark, dir, Seq(3L))
    MultiVec.consolidateIndex(spark, dir)
    assert(MultiVec.validateIndex(spark, dir) == 8 * 4)
    // corruption: a posting filed under the wrong centroid (a duplicate
    // (mdoc, t_idx) with a foreign cent) must be named in the error
    val cents = MultiVec.loadCentroids(spark, dir)
    val one = spark.read.parquet(served(dir)).limit(1)
    val corrupt = MultiVec.assign(one.select("mdoc", "t_idx", "tok"), cents)
      .withColumn("cent", (col("cent") + 1) % cents.length)
    MultiVec.appendTokenPostings(corrupt, served(dir))
    val e = intercept[Exception] { MultiVec.validateIndex(spark, dir) }
    assert(e.getMessage.contains("non-nearest centroid"), e.getMessage)
  }

  test("hot-path plans carry no Scala UDFs; normalize yields unit tokens") {
    val rows = corpus(nDocs = 10, tpd = 4, dim = 16, seed = 17L)
    val toks = rows.map { case (d, t, v) => (d, t, v.toSeq) }
      .toDF("mdoc", "t_idx", "tok")
      .withColumn("tok", col("tok").cast("array<float>"))
    val qToks = rows.filter(_._1 == 0L).sortBy(_._2).toArray
    val cents = MultiVec.trainCentroids(toks, 4, seed = 5L)
    val assigned = MultiVec.assign(toks.where(col("mdoc") =!= 0), cents)
    val probes = MultiVec.probeSets(qToks, cents, 2)
    for (df <- Seq(
        MultiVec.scoreFlat(toks.where(col("mdoc") =!= 0), qToks),
        MultiVec.approxScores(assigned, qToks, probes),
        MultiVec.plaidSearch(assigned, qToks, probes, 8))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF"), plan.take(2000))
    }
    // normalize = true unit-norms every token (the cosine convention)
    val e = rows.take(4).map { case (d, t, v) => (d * 4 + t, v.toSeq) }
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    MultiVec.tokens(e, "vec_id", "embedding", 4, normalize = true)
      .select("tok").collect().foreach { r =>
        val n = math.sqrt(r.getSeq[Float](0).map(x => x.toDouble * x).sum)
        assert(math.abs(n - 1.0) < 1e-5, s"norm $n")
      }
  }

  test("tokens derives doc/position ids by integral division") {
    val e = Seq((0L, Seq(1f)), (3L, Seq(2f)), (4L, Seq(3f)), (7L, Seq(4f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = MultiVec.tokens(e, "vec_id", "embedding", 4)
      .select("mdoc", "t_idx").as[(Long, Int)].collect().toSet
    assert(got === Set((0L, 0), (0L, 3), (1L, 0), (1L, 3)))
  }
}
