package graft

import graft.SparkTestBase

/** CLI dispatcher: each subcommand drives the real library operator
  * (the session is the shared test session via getOrCreate). */
class CliSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-cli").toFile, name).toString

  test("arg parsing: pairs, bare flags, unknown command/options") {
    assert(Cli.parseArgs(Seq("--a", "1", "--b", "x")) == Map("a" -> "1", "b" -> "x"))
    // bare boolean flags — trailing or followed by another option
    assert(Cli.parseArgs(Seq("--a", "1", "--once")) == Map("a" -> "1", "once" -> "true"))
    assert(Cli.parseArgs(Seq("--once", "--a", "1")) == Map("once" -> "true", "a" -> "1"))
    intercept[IllegalArgumentException] { Cli.parseArgs(Seq("a", "1")) }
    intercept[IllegalArgumentException] { Cli.run("no-such-command", Map.empty) }
    intercept[IllegalArgumentException] { Cli.run("create-index", Map.empty) }
    // misspelled options are an error, not a silent default
    val e = intercept[IllegalArgumentException] {
      Cli.run("autotune-index", Map("src" -> "p", "id-col" -> "id",
        "vec-col" -> "v", "target_recall" -> "0.95"))
    }
    assert(e.getMessage.contains("--target_recall"), e.getMessage)
  }

  test("sparse-postings and sparse-search subcommands") {
    spark // force shared session so Cli's getOrCreate reuses it
    val out = tmp("post")
    Cli.run("sparse-postings", Map(
      "src" -> (sf("sf0.001") + "/embeddings.parquet"),
      "id-col" -> "vec_id", "vec-col" -> "embedding", "out" -> out))
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("tb=")))
    // search over the written postings: pruned read + inverted top-k
    Cli.run("sparse-search", Map("postings" -> out, "id-col" -> "vec_id",
      "terms" -> "0,5,9", "weights" -> "0.3,0.2,0.4", "k" -> "5"))
    intercept[IllegalArgumentException] {
      Cli.run("sparse-search", Map("postings" -> out, "id-col" -> "vec_id",
        "terms" -> "0,5,9", "weights" -> "0.3,0.2,0.4", "kk" -> "5"))
    }
  }

  test("multivec-index and multivec-search subcommands") {
    spark // force shared session so Cli's getOrCreate reuses it
    val out = tmp("mvidx")
    Cli.run("multivec-index", Map(
      "src" -> (sf("sf0.001") + "/embeddings.parquet"),
      "id-col" -> "vec_id", "vec-col" -> "embedding", "out" -> out,
      "nlists" -> "8"))
    assert(new java.io.File(out, "postings").listFiles()
      .exists(_.getName.startsWith("cent=")))
    assert(graft.ops.MultiVec.loadCentroids(spark, out).length == 8)
    Cli.run("multivec-search", Map("index" -> out,
      "src" -> (sf("sf0.001") + "/embeddings.parquet"),
      "id-col" -> "vec_id", "vec-col" -> "embedding",
      "query-doc" -> "0", "k" -> "5", "nprobe" -> "4", "cand" -> "20"))
    // the index records toksPerDoc + dim; a conflicting flag is
    // rejected instead of silently mis-slicing the query doc
    assert(graft.ops.MultiVec.readIndexMeta(spark, out) == (4, 64))
    val ex = intercept[IllegalArgumentException] {
      Cli.run("multivec-search", Map("index" -> out,
        "src" -> (sf("sf0.001") + "/embeddings.parquet"),
        "id-col" -> "vec_id", "vec-col" -> "embedding",
        "query-doc" -> "0", "toks-per-doc" -> "5", "k" -> "5"))
    }
    assert(ex.getMessage.contains("toks-per-doc"))
  }

  test("create-index --kind mrl builds a prefix artifact; stray flags rejected") {
    spark // force shared session so Cli's getOrCreate reuses it
    val out = tmp("mrlidx")
    Cli.run("create-index", Map(
      "src" -> (sf("sf0.001") + "/embeddings.parquet"),
      "id-col" -> "vec_id", "vec-col" -> "embedding", "index" -> out,
      "kind" -> "mrl", "m" -> "8"))
    assert(graft.ann.MrlIndex.isMrl(spark, out))
    assert(graft.ann.MrlIndex.m(spark, out) == 8)
    assert(graft.ann.MrlIndex.livePrefixes(spark, out)
      .head().getSeq[Float](1).length == 8)
    // hnsw-only tuning flags are an error under mrl, like bq
    intercept[IllegalArgumentException] {
      Cli.run("create-index", Map(
        "src" -> (sf("sf0.001") + "/embeddings.parquet"),
        "id-col" -> "vec_id", "vec-col" -> "embedding", "index" -> tmp("x"),
        "kind" -> "mrl", "ef" -> "64"))
    }
  }

  test("validate-index sniffs the layout, passes valid artifacts, rejects drift") {
    spark // force shared session so Cli's getOrCreate reuses it
    val src = sf("sf0.001") + "/embeddings.parquet"
    val srcOpts = Map("src" -> src, "id-col" -> "vec_id",
      "vec-col" -> "embedding")
    // mrl (structural-only arm: no --src needed)
    val mrlOut = tmp("vcli-mrl")
    Cli.run("create-index", srcOpts ++ Map("index" -> mrlOut,
      "kind" -> "mrl", "m" -> "8"))
    Cli.run("validate-index", Map("index" -> mrlOut))
    Cli.run("validate-index", srcOpts ++ Map("index" -> mrlOut))
    // bq REQUIRES the source (signatures re-derive from it)
    val bqOut = tmp("vcli-bq")
    Cli.run("create-index", srcOpts ++ Map("index" -> bqOut, "kind" -> "bq"))
    Cli.run("validate-index", srcOpts ++ Map("index" -> bqOut))
    intercept[IllegalArgumentException] {
      Cli.run("validate-index", Map("index" -> bqOut))
    }
    // a drifted source is named as a violation, not a silent pass
    val drifted = tmp("vcli-drift")
    spark.read.parquet(src).limit(40).write.parquet(drifted)
    intercept[IllegalStateException] {
      Cli.run("validate-index", Map("index" -> bqOut, "src" -> drifted,
        "id-col" -> "vec_id", "vec-col" -> "embedding"))
    }
    // multivec + sparse layouts dispatch to their own validators (they
    // previously fell through to the hnsw walk and failed confusingly)
    val e = spark.read.parquet(src).limit(40)
    val flat = graft.ops.MultiVec.tokens(e, "vec_id", "embedding", 4)
    val mvOut = tmp("vcli-mv")
    graft.ops.MultiVec.writeIndex(flat, mvOut, nlists = 8)
    Cli.run("validate-index", Map("index" -> mvOut))
    val mvDocs = tmp("vcli-mvdocs")
    graft.ops.MultiVec.docArrays(flat).write.parquet(mvDocs)
    Cli.run("validate-index", Map("index" -> mvOut, "src" -> mvDocs,
      "id-col" -> "mdoc", "vec-col" -> "toks"))
    val svTbl = tmp("vcli-svtbl")
    e.select($"vec_id", graft.ops.SparseSearch
        .sparsify($"embedding", 0.0f).as("sv"))
      .write.parquet(svTbl)
    val spOut = tmp("vcli-sparse")
    graft.ops.SparseSearch.writePostings(
      graft.ops.SparseSearch.postings(
        spark.read.parquet(svTbl), "vec_id", $"sv"), spOut, buckets = 4)
    Cli.run("validate-index", Map("index" -> spOut))
    Cli.run("validate-index", Map("index" -> spOut, "src" -> svTbl,
      "id-col" -> "vec_id", "vec-col" -> "sv"))
  }

  test("retune-index re-derives a stale budget and persists the catalog") {
    spark // force shared session so Cli's getOrCreate reuses it
    import graft.plans.AnnCatalog
    val src = sf("sf0.001") + "/embeddings.parquet"
    val bqOut = tmp("retune-bq")
    Cli.run("create-index", Map("src" -> src, "id-col" -> "vec_id",
      "vec-col" -> "embedding", "index" -> bqOut, "kind" -> "bq"))
    // a catalog carrying a deliberately starved rescore pool
    val cat = tmp("retune-cat") + "/catalog.json"
    AnnCatalog.register(spark, src, AnnCatalog.IndexMeta(bqOut, "vec_id",
      "embedding", "l2sq", ef = 12, kind = "bq"))
    AnnCatalog.save(spark, cat)
    AnnCatalog.unregister(spark, src)
    try {
      Cli.run("retune-index", Map("table" -> src, "vec-col" -> "embedding",
        "catalog" -> cat, "query-count" -> "4", "max-widen" -> "64"))
      // the widened budget survives a fresh load — the serving contract
      AnnCatalog.clear()
      assert(AnnCatalog.load(spark, cat) >= 1)
      val m = AnnCatalog.metaFor(spark, src, "embedding", "l2sq").get
      assert(m.kind == "bq" && m.ef > 12)
    } finally AnnCatalog.unregister(spark, src)
  }

  test("maintain sweeps the catalog: compacts, validates, retunes, persists") {
    spark // force shared session so Cli's getOrCreate reuses it
    import graft.plans.AnnCatalog
    val src = sf("sf0.001") + "/embeddings.parquet"
    val bqOut = tmp("maint-bq")
    Cli.run("create-index", Map("src" -> src, "id-col" -> "vec_id",
      "vec-col" -> "embedding", "index" -> bqOut, "kind" -> "bq"))
    val cat = tmp("maint-cat") + "/catalog.json"
    AnnCatalog.register(spark, src, AnnCatalog.IndexMeta(bqOut, "vec_id",
      "embedding", "l2sq", ef = 12, kind = "bq"))
    AnnCatalog.save(spark, cat)
    AnnCatalog.unregister(spark, src)
    try {
      Cli.run("maintain", Map("catalog" -> cat, "query-count" -> "4",
        "max-widen" -> "64", "parallelism" -> "2"))
      AnnCatalog.clear()
      AnnCatalog.load(spark, cat)
      assert(AnnCatalog.metaFor(spark, src, "embedding", "l2sq").get.ef > 12)
    } finally AnnCatalog.unregister(spark, src)
  }

  test("create-embeddings and create-index subcommands produce real artifacts") {
    spark // force shared session so Cli's getOrCreate reuses it
    val src = tmp("src")
    (0 until 50).map(i => (i.toLong, s"doc number $i")).toDF("id", "text")
      .write.parquet(src)
    val out = tmp("emb")
    Cli.run("create-embeddings", Map(
      "src" -> src, "id-col" -> "id", "text-col" -> "text", "out" -> out))
    val emb = spark.read.parquet(out)
    assert(emb.count() == 50)
    val v = emb.where($"id" === 7)
      .select(graft.embed.EmbeddingPipeline.EmbeddingCol)
      .head().getSeq[Float](0).toArray
    assert(v.sameElements(graft.embed.HashEmbeddingRuntime.embed("doc number 7", 8)))

    val vecs = tmp("vecs")
    emb.select($"id", org.apache.spark.sql.functions.col(
      graft.embed.EmbeddingPipeline.EmbeddingCol).as("vec"))
      .write.parquet(vecs)
    val idx = tmp("idx")
    Cli.run("create-index", Map(
      "src" -> vecs, "id-col" -> "id", "vec-col" -> "vec", "index" -> idx,
      "m" -> "8", "quant" -> "i8", "partitions" -> "2"))
    val h = graft.ann.AnnIndex.readHeader(spark, idx)
    assert(h.quant == "i8" && h.dim == 8)
    val got = graft.ann.AnnIndex.search(spark, idx, v, 3).map(_._1)
    assert(got.contains(7L), got.toSeq.toString)

    // --kind bq builds the sign-bit artifact; pool = corpus serves exact
    val bqIdx = tmp("bqidx")
    Cli.run("create-index", Map(
      "src" -> vecs, "id-col" -> "id", "vec-col" -> "vec",
      "index" -> bqIdx, "kind" -> "bq"))
    assert(graft.ann.BqIndex.isBq(spark, bqIdx))
    val cand = graft.ann.BqIndex.candidateIds(spark, bqIdx, v, 50)
    assert(cand.length == 50 && cand.contains(7L))
    intercept[IllegalArgumentException] {
      Cli.run("create-index", Map(
        "src" -> vecs, "id-col" -> "id", "vec-col" -> "vec",
        "index" -> tmp("bad"), "kind" -> "nope"))
    }
    // hnsw tuning flags with --kind bq are an error, not silently dropped
    intercept[IllegalArgumentException] {
      Cli.run("create-index", Map(
        "src" -> vecs, "id-col" -> "id", "vec-col" -> "vec",
        "index" -> tmp("bad2"), "kind" -> "bq", "ef" -> "256"))
    }
  }

  test("start-daemon --once runs queued jobs and exits") {
    spark
    val root = tmp("d")
    val src = s"$root/src"
    (0 until 10).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
      .write.parquet(src)
    graft.streaming.EmbeddingJobs.submit(spark, s"$root/jobs", s"$root/status",
      1L, src, "doc_id", "text")
    Cli.run("start-daemon", Map(
      "jobs" -> s"$root/jobs", "status" -> s"$root/status",
      "results" -> s"$root/results", "ckpt" -> s"$root/ckpt", "once" -> "true"))
    assert(spark.read.parquet(s"$root/results/job-1/embeddings").count() == 10)
  }

  test("autotune dir flags without --autotune-jobs are an error, not ignored") {
    val e = intercept[IllegalArgumentException] {
      Cli.run("start-daemon", Map(
        "jobs" -> "j", "status" -> "s", "results" -> "r", "ckpt" -> "c",
        "autotune-status" -> "x", "once" -> "true"))
    }
    assert(e.getMessage.contains("--autotune-jobs"), e.getMessage)
  }

  test("start-daemon isolates the two job families' status/results dirs") {
    spark
    val root = tmp("d2")
    val src = s"$root/src"
    (0 until 200).map { i =>
      val v = Array.fill(8)(0.01f * ((i + 3) % 7)); v(i % 8) = 1.0f
      (i.toLong, s"text $i", v.toSeq)
    }.toDF("doc_id", "text", "vec").write.parquet(src)
    // SAME job_id in both families — job_id is the only key, so with a
    // shared results dir the embedding runner's clean-slate delete of
    // results/job-1 would wipe the autotune job's report
    graft.streaming.EmbeddingJobs.submit(spark, s"$root/jobs", s"$root/status",
      1L, src, "doc_id", "text")
    graft.streaming.AutotuneJobs.submit(spark, s"$root/atjobs",
      s"$root/status-autotune", 1L, src, "doc_id", "vec", k = 5)
    Cli.run("start-daemon", Map(
      "jobs" -> s"$root/jobs", "status" -> s"$root/status",
      "results" -> s"$root/results", "ckpt" -> s"$root/ckpt",
      "autotune-jobs" -> s"$root/atjobs", "once" -> "true"))
    assert(spark.read.parquet(s"$root/results/job-1/embeddings").count() == 200)
    assert(spark.read.parquet(s"$root/results-autotune/job-1/report").count() > 0)
    import org.apache.spark.sql.functions.col
    Seq(s"$root/status", s"$root/status-autotune").foreach { st =>
      assert(graft.streaming.EmbeddingJobs.status(spark, st)
        .where(col("job_id") === 1).select("status").as[String].head() == "completed", st)
    }
  }
}
