package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.sparse_dot

/** Learned-sparse retrieval: sparsify shape, sorted-merge dot
  * semantics, exact == inverted path equality, and plan hygiene. */
class SparseSearchSpec extends SparkTestBase {
  import spark.implicits._

  private def dense(rows: (Long, Seq[Float])*) =
    rows.toDF("id", "v").select($"id", $"v".cast("array<float>").as("v"))

  /** Local-fs path of the data dir currently SERVING `dir` — after a
    * consolidate that is the committed generation, not the root. */
  private def served(dir: String): String =
    new java.net.URI(SparseSearch.dataDir(spark, dir)).getPath

  test("sparsify keeps >= tau coordinates with ascending indices") {
    val df = dense(1L -> Seq(0.5f, 0.01f, 0.125f, -0.9f, 0.2f))
      .select($"id", SparseSearch.sparsify($"v", 0.125f).as("sv"))
    val r = df.select($"sv.indices", $"sv.values").head()
    assert(r.getSeq[Int](0) == Seq(0, 2, 4))
    assert(r.getSeq[Float](1) == Seq(0.5f, 0.125f, 0.2f))
  }

  test("sparse_dot merges shared indices only; disjoint vectors score 0") {
    val a = SparseSearch.queryLit(Seq(1, 3, 7), Seq(2f, 3f, 5f))
    val b = SparseSearch.queryLit(Seq(0, 3, 7, 9), Seq(10f, 4f, 0.5f, 1f))
    val c = SparseSearch.queryLit(Seq(2, 4), Seq(1f, 1f))
    val r = spark.range(1)
      .select(sparse_dot(a, b).as("ab"), sparse_dot(a, c).as("ac"))
      .head()
    assert(r.getDouble(0) == 3.0 * 4.0 + 5.0 * 0.5)
    assert(r.getDouble(1) == 0.0)
  }

  test("sparse_dot equals the dense dot on sparsified real vectors") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet").limit(50)
    val q = e.where($"vec_id" === 0)
      .select(SparseSearch.sparsify($"embedding", 0.125f).as("qv"))
    val sparse = e.crossJoin(broadcast(q))
      .select($"vec_id",
        sparse_dot(SparseSearch.sparsify($"embedding", 0.125f), $"qv").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val qDense = e.where($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0)
    val expected = e.select($"vec_id", $"embedding").collect().map { r =>
      val v = r.getSeq[Float](1)
      val s = v.indices.foldLeft(0.0) { (acc, i) =>
        if (v(i) >= 0.125f && qDense(i) >= 0.125f)
          acc + v(i).toDouble * qDense(i).toDouble
        else acc
      }
      r.getLong(0) -> s
    }.toMap
    assert(sparse == expected)
  }

  test("all-pass sparsify reduces sparse_dot to the dense inner_product") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet").limit(30)
    val q = e.where($"vec_id" === 0)
      .select($"embedding".as("qd"),
        SparseSearch.sparsify($"embedding", Float.MinValue).as("qv"))
    val rows = e.crossJoin(broadcast(q))
      .select(
        sparse_dot(SparseSearch.sparsify($"embedding", Float.MinValue), $"qv").as("s"),
        graft.functions.inner_product($"embedding", $"qd").as("d"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("queryLit and SparseDot validate their inputs") {
    intercept[IllegalArgumentException] {
      SparseSearch.queryLit(Seq(1, 2), Seq(1f))
    }
    intercept[IllegalArgumentException] {
      SparseSearch.queryLit(Seq(3, 2), Seq(1f, 1f))
    }
    val bad = struct(typedlit(Seq(1, 2)).as("indices"),
      typedlit(Seq(1f)).as("values"))
    val ex = intercept[Exception] {
      spark.range(1).select(sparse_dot(bad, bad)).collect()
    }
    assert(ex.getMessage.contains("length mismatch") ||
      ex.getCause.getMessage.contains("length mismatch"))
    // sparsify(NULL dense) wraps null arrays in a non-null struct — a
    // crisp error, not an NPE
    val nullSv = SparseSearch.sparsify(lit(null).cast("array<float>"), 0f)
    val ex2 = intercept[Exception] {
      spark.range(1).select(sparse_dot(nullSv, nullSv)).collect()
    }
    assert(ex2.getMessage.contains("null indices") ||
      (ex2.getCause != null && ex2.getCause.getMessage.contains("null indices")),
      ex2.toString)
  }

  test("inverted path is bit-identical to the exact path") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val sv = e.where($"vec_id" =!= 0)
      .select($"vec_id", SparseSearch.sparsify($"embedding", 0.125f).as("sv"))
    val qRow = e.where($"vec_id" === 0)
      .select(SparseSearch.sparsify($"embedding", 0.125f).as("qv"))
      .head().getStruct(0)
    val qIdx = qRow.getSeq[Int](0)
    val qVal = qRow.getSeq[Float](1)
    val exact = SparseSearch.topK(sv, "vec_id", $"sv",
        SparseSearch.queryLit(qIdx, qVal), k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val post = SparseSearch.postings(sv, "vec_id", $"sv")
    val inv = SparseSearch.invertedTopK(post, "vec_id", qIdx, qVal, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(exact.nonEmpty)
    assert(exact == inv) // same docs, same order, bit-identical doubles
  }

  test("bucketed postings prune the scan to the query terms' buckets") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val sv = e.select($"vec_id", SparseSearch.sparsify($"embedding", 0.125f).as("sv"))
    val post = SparseSearch.postings(sv, "vec_id", $"sv")
    val dir = java.nio.file.Files.createTempDirectory("graft-sparse").toString + "/post"
    val buckets = 16
    SparseSearch.writePostings(post, dir, buckets)
    // terms 0/5/9 land in buckets 0/5/9 at buckets=16
    val qIdx = Seq(0, 5, 9)
    val pruned = SparseSearch.readPostings(spark, dir, qIdx)
    // pruning happens at file-listing time: PartitionFilters on the
    // bucket column; the executed scan reads ONLY the query buckets'
    // files, while the residual term predicate pushes into parquet
    val qe = pruned.queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tb"), plan)
    assert(plan.contains("PushedFilters") && plan.contains("term"), plan)
    pruned.collect()
    val scan = qe.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val bucketDirs = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("tb="))
    // directory fan-out is BOUNDED by the bucket count (never the
    // vocabulary size), one file per bucket per write, and the pruned
    // read touches only the query's buckets
    assert(bucketDirs <= buckets, s"$bucketDirs dirs > $buckets buckets")
    assert(bucketDirs > qIdx.size, s"only $bucketDirs buckets on disk")
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("tb=")).foreach { d =>
        val n = d.listFiles().count(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("."))
        assert(n == 1, s"${d.getName} holds $n files after one write")
      }
    assert(scan.metrics("numFiles").value <= qIdx.size.toLong)
    // and the pruned read scores identically to the in-memory postings
    val qVal = Seq(0.3f, 0.2f, 0.4f)
    val full = SparseSearch.invertedTopK(
        post.where($"term".isin(qIdx: _*)), "vec_id", qIdx, qVal, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaDisk = SparseSearch.invertedTopK(pruned, "vec_id", qIdx, qVal, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full.nonEmpty && full == viaDisk)
  }

  test("append adds one file per bucket; delete masks; consolidate compacts") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val sv = e.where($"vec_id" =!= 0)
      .select($"vec_id", SparseSearch.sparsify($"embedding", 0.125f).as("sv"))
    val dir = java.nio.file.Files.createTempDirectory("graft-slc").toString + "/post"
    val maxId = e.agg(max($"vec_id")).head().getLong(0)
    SparseSearch.writePostings(
      SparseSearch.postings(sv.where($"vec_id" <= maxId / 2), "vec_id", $"sv"),
      dir, buckets = 8)
    SparseSearch.appendPostings(
      SparseSearch.postings(sv.where($"vec_id" > maxId / 2), "vec_id", $"sv"), dir)
    // after one write + one append: at most two files per bucket dir
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("tb=")).foreach { d =>
        val n = d.listFiles().count(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("."))
        assert(n <= 2, s"${d.getName} holds $n files after write+append")
      }
    val qRow = e.where($"vec_id" === 0)
      .select(SparseSearch.sparsify($"embedding", 0.125f).as("qv"))
      .head().getStruct(0)
    val qIdx = qRow.getSeq[Int](0)
    val qVal = qRow.getSeq[Float](1)
    val before = SparseSearch.invertedTopK(
        SparseSearch.readPostings(spark, dir, qIdx), "vec_id", qIdx, qVal, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(before.nonEmpty)
    // tombstone the current top hit: the masked read must drop it
    SparseSearch.deletePostings(spark, dir, Seq(before.head))
    val afterDel = SparseSearch.invertedTopK(
        SparseSearch.readPostings(spark, dir, qIdx), "vec_id", qIdx, qVal, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(!afterDel.contains(before.head))
    // consolidate: physical delete + back to one file per bucket,
    // tombstones retired, scores unchanged
    SparseSearch.consolidatePostings(spark, dir)
    assert(!new java.io.File(s"$dir/_tombstones").exists())
    // the committed generation serves; the root keeps only meta + gens
    val gen = new java.io.File(served(dir))
    assert(gen.getName.startsWith("data_g"),
      s"consolidate must publish a committed generation, got $gen")
    val bucketDirs = gen.listFiles().filter(_.getName.startsWith("tb="))
    assert(bucketDirs.nonEmpty)
    bucketDirs.foreach { d =>
      val n = d.listFiles().count(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("."))
      assert(n == 1, s"${d.getName} holds $n files after consolidate")
    }
    assert(!new java.io.File(dir).listFiles().exists(
      _.getName.startsWith("tb=")), "legacy root buckets must retire")
    assert(spark.read.parquet(served(dir))
      .where($"vec_id" === before.head).count() == 0)
    val afterCons = SparseSearch.invertedTopK(
        SparseSearch.readPostings(spark, dir, qIdx), "vec_id", qIdx, qVal, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(afterCons == afterDel)
  }

  test("consolidate preserves tombstone files appended during compaction") {
    // the race: a deletePostings lands AFTER the snapshot/compaction
    // but BEFORE the swap — the test seam injects it right there; the
    // late tombstone must survive into the new generation and keep
    // masking its doc
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet").limit(40)
    val sv = e.select($"vec_id", SparseSearch.sparsify($"embedding", Float.MinValue).as("sv"))
    val dir = java.nio.file.Files.createTempDirectory("graft-srace").toString + "/post"
    SparseSearch.writePostings(
      SparseSearch.postings(sv, "vec_id", $"sv"), dir, buckets = 4)
    SparseSearch.deletePostings(spark, dir, Seq(1L))
    SparseSearch.consolidatePostings(spark, dir,
      () => SparseSearch.deletePostings(spark, dir, Seq(2L)))
    // doc 1 physically gone (snapshot applied); doc 2's LATE tombstone
    // survived at the stable root — still present, still masking
    assert(spark.read.parquet(served(dir)).where($"vec_id" === 1L).count() == 0)
    assert(new java.io.File(s"$dir/_tombstones").exists())
    assert(spark.read.parquet(served(dir)).where($"vec_id" === 2L).count() > 0)
    val ids = SparseSearch.readPostings(spark, dir, Seq(0))
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!ids.contains(1L) && !ids.contains(2L) && ids.nonEmpty)
  }

  test("a reader racing the generation swap never observes missing data " +
      "— and a racing deletePostings never collides with it") {
    // The old two-rename root swap had (a) an instant with NO table at
    // the serving path, and (b) a collision protocol for deletes
    // recreating the root mid-swap. Generations retire both: the root
    // never moves, and a reader resolving at ANY point — including the
    // window after the new generation commits and before the previous
    // data is deleted — finds complete committed data. This test reads
    // inside exactly that window, and injects racing deletes at both
    // seams.
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet").limit(40)
    val sv = e.select($"vec_id",
      SparseSearch.sparsify($"embedding", Float.MinValue).as("sv"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-srace2").toString + "/post"
    SparseSearch.writePostings(
      SparseSearch.postings(sv, "vec_id", $"sv"), dir, buckets = 4)
    val allIds = spark.read.parquet(dir)
      .select("vec_id").distinct().count()
    def readerSees(): Long = SparseSearch
      .readPostings(spark, dir,
        (0 until 64).toSeq) // every bucket — a full-corpus read
      .select("vec_id").distinct().count()
    var sawInWindow = -1L
    SparseSearch.consolidatePostings(spark, dir,
      // a deletePostings lands mid-compaction: the root tombstone dir
      // is stable, so the full call (meta re-read included) just works
      afterCompact = () => SparseSearch.deletePostings(spark, dir, Seq(2L)),
      beforeOldDelete = () => sawInWindow = readerSees())
    // the in-window reader resolved the freshly committed generation:
    // complete data, with the racing delete already masking
    assert(sawInWindow == allIds - 1,
      s"reader in the swap window saw $sawInWindow of $allIds docs")
    // the racing delete survived: physically present (it missed the
    // snapshot), tombstoned, masked in every read
    assert(new java.io.File(s"$dir/_tombstones").exists())
    assert(spark.read.parquet(served(dir)).where($"vec_id" === 2L).count() > 0)
    val ids = SparseSearch.readPostings(spark, dir, Seq(0))
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!ids.contains(2L) && ids.nonEmpty)
    // the NEXT consolidation applies it physically and retires the
    // older generation — exactly one committed generation remains
    SparseSearch.consolidatePostings(spark, dir)
    assert(spark.read.parquet(served(dir))
      .where($"vec_id" === 2L).count() == 0)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("data_g")) == 1)
    // crashed-attempt hygiene: an UNCOMMITTED staging leftover neither
    // serves nor bricks the next consolidate
    val stale = new java.io.File(dir, ".data_g000099.inprogress")
    assert(stale.mkdirs())
    val servedBefore = served(dir)
    assert(served(dir) == servedBefore)
    SparseSearch.consolidatePostings(spark, dir)
    assert(new java.io.File(served(dir)).getName.startsWith("data_g"))
  }

  test("plan hygiene: no ScalaUDF; exact path reduces via TakeOrderedAndProject") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val sv = e.select($"vec_id", SparseSearch.sparsify($"embedding", 0.125f).as("sv"))
    val q = SparseSearch.queryLit(Seq(0, 3), Seq(0.2f, 0.3f))
    val exactPlan = SparseSearch.topK(sv, "vec_id", $"sv", q, 10)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("TakeOrderedAndProject"), exactPlan)
    assert(!exactPlan.contains("ScalaUDF"), exactPlan)
    val invPlan = SparseSearch.invertedTopK(
        SparseSearch.postings(sv, "vec_id", $"sv"), "vec_id",
        Seq(0, 3), Seq(0.2f, 0.3f), 10)
      .queryExecution.executedPlan.toString
    assert(!invPlan.contains("ScalaUDF"), invPlan)
  }

  test("sparse_dot is registered for SQL") {
    spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select($"vec_id", SparseSearch.sparsify($"embedding", 0.125f).as("sv"))
      .createOrReplaceTempView("sparse_docs")
    val n = spark.sql(
      """SELECT count(*) FROM sparse_docs a JOIN sparse_docs b ON a.vec_id = 0
        |WHERE sparse_dot(a.sv, b.sv) > 0""".stripMargin).head().getLong(0)
    assert(n > 0)
  }
}
