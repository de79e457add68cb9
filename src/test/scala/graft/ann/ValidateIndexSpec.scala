package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.SparseSearch

/** Injected-violation coverage for every `validate_index` analog
  * (reference lantern_hnsw/src/hnsw/validate_index.c:436-528 — the
  * reference calls it from most tests, e.g. test/sql/hnsw_correct.sql):
  * each validator must pass on a freshly built + appended artifact and
  * THROW, naming the planted violation, when the artifact or its
  * claimed source drifts. The corruption is injected the way real
  * corruption arrives: foreign parquet rows appended into the artifact
  * (a bad writer), or a source table that no longer matches (stale
  * index). */
class ValidateIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def emb: DataFrame =
    spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select($"vec_id", $"embedding")

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/idx"

  /** `df` with one row's whole vector shifted +10 (data lives in
    * ~[-1,1]) — the "stale index" source. The shift provably crosses
    * every codec boundary: every bq sign bit goes to 1 (vs a center
    * inside the data range, and no real row packs all-ones), and every
    * pq/ivfpq subvector lands far from its original centroid. */
  private def perturbed(df: DataFrame, id: Long): DataFrame =
    df.withColumn("embedding",
      when($"vec_id" === id,
        transform($"embedding", x => x + lit(10.0f)))
        .otherwise($"embedding"))

  // ------------------------------------------------------------ hnsw

  test("hnsw validateIndex: green on build+append+delete; violations named") {
    val e = emb
    val dir = freshDir("vx-hnsw")
    val maxId = e.agg(max($"vec_id")).head().getLong(0)
    AnnIndex.build(e.where($"vec_id" <= maxId / 2), "vec_id", "embedding",
      dir, AnnParams(m = 8, efConstruction = 64, numPartitions = 2))
    AnnIndex.append(e.where($"vec_id" > maxId / 2), "vec_id", "embedding", dir)
    assert(AnnIndex.validateIndex(spark, dir,
      source = Some((e, "vec_id", "embedding"))) == e.count())

    // a tombstoned id is excused from the missing-row direction (and
    // absent from the live count — vectors() masks it)
    AnnIndex.delete(spark, dir, Seq(maxId))
    assert(AnnIndex.validateIndex(spark, dir,
      source = Some((e, "vec_id", "embedding"))) == e.count() - 1)

    // f32 storage: a drifted source vector is a named violation
    val drift = intercept[IllegalStateException] {
      AnnIndex.validateIndex(spark, dir,
        source = Some((perturbed(e, 3L), "vec_id", "embedding")))
    }
    assert(drift.getMessage.contains("does not re-derive") &&
      drift.getMessage.contains("3"), drift.getMessage)

    // missing source row
    val dir2 = freshDir("vx-hnswmiss")
    AnnIndex.build(e.where($"vec_id" =!= 9L), "vec_id", "embedding",
      dir2, AnnParams(m = 8, efConstruction = 64, numPartitions = 2))
    val missing = intercept[IllegalStateException] {
      AnnIndex.validateIndex(spark, dir2,
        source = Some((e, "vec_id", "embedding")))
    }
    assert(missing.getMessage.contains("is not stored") &&
      missing.getMessage.contains("9"), missing.getMessage)
  }

  // ------------------------------------------------------------- bq

  test("bq validateIndex: green on build+append; names planted violations") {
    val e = emb
    val dir = freshDir("vx-bq")
    val maxId = e.agg(max($"vec_id")).head().getLong(0)
    BqIndex.build(e.where($"vec_id" <= maxId / 2), "vec_id", "embedding", dir)
    BqIndex.append(e.where($"vec_id" > maxId / 2), "vec_id", "embedding", dir)
    assert(BqIndex.validateIndex(e, "vec_id", "embedding", dir) == e.count())

    // a tombstoned id is excused from the missing-row direction
    BqIndex.delete(spark, dir, Seq(maxId))
    assert(BqIndex.validateIndex(e, "vec_id", "embedding", dir) == e.count())

    // bit drift: one source vector no longer matches its signature
    val drift = intercept[IllegalStateException] {
      BqIndex.validateIndex(perturbed(e, 3L), "vec_id", "embedding", dir)
    }
    assert(drift.getMessage.contains("do not re-derive") &&
      drift.getMessage.contains("3"), drift.getMessage)

    // wrong signature width: a planted row with one extra word
    val words = spark.read.parquet(s"$dir/bits")
      .select(size($"bits")).head().getInt(0)
    Seq((2L, (0 to words).map(_ => 7)))
      .toDF("id", "bits").write.mode("append").parquet(s"$dir/bits")
    val badLen = intercept[IllegalStateException] {
      BqIndex.validateIndex(e, "vec_id", "embedding", dir)
    }
    assert(badLen.getMessage.contains("signature words"), badLen.getMessage)
  }

  test("table-first delete: a tombstoned stored row is excused from the " +
      "orphan direction; an untombstoned one stays corruption") {
    // the table is authoritative and drops a row FIRST; until the index
    // learns (delete -> tombstone), validation must flag the divergence;
    // once tombstoned, the row can never serve, so it must validate
    val victim = emb.orderBy($"vec_id").head().getLong(0)
    val shrunk = emb.where($"vec_id" =!= victim)
    // bq
    val bqIdx = freshDir("graft-v-tfirst-bq")
    BqIndex.build(emb, "vec_id", "embedding", bqIdx)
    intercept[IllegalStateException] {
      BqIndex.validateIndex(shrunk, "vec_id", "embedding", bqIdx)
    }
    BqIndex.delete(spark, bqIdx, Seq(victim))
    BqIndex.validateIndex(shrunk, "vec_id", "embedding", bqIdx)
    // ivf
    val ivfIdx = freshDir("graft-v-tfirst-ivf")
    IvfIndex.build(emb, "vec_id", "embedding", ivfIdx, nlists = 4)
    intercept[IllegalStateException] {
      IvfIndex.validateIndex(spark, ivfIdx,
        Some((shrunk, "vec_id", "embedding")))
    }
    IvfIndex.delete(spark, ivfIdx, Seq(victim))
    IvfIndex.validateIndex(spark, ivfIdx,
      Some((shrunk, "vec_id", "embedding")))
  }

  test("bq validateIndex: a MISSING source row is corruption (blind-spot check)") {
    val e = emb
    val dir = freshDir("vx-bqmiss")
    BqIndex.build(e.where($"vec_id" =!= 5L), "vec_id", "embedding", dir)
    val missing = intercept[IllegalStateException] {
      BqIndex.validateIndex(e, "vec_id", "embedding", dir)
    }
    assert(missing.getMessage.contains("is not stored") &&
      missing.getMessage.contains("5"), missing.getMessage)
  }

  // ------------------------------------------------------------- mrl

  test("mrl validateIndex: green on build+append; names planted violations") {
    val e = emb
    val dir = freshDir("vx-mrl")
    val maxId = e.agg(max($"vec_id")).head().getLong(0)
    MrlIndex.build(e.where($"vec_id" <= maxId / 2), "vec_id", "embedding",
      m = 16, dir)
    MrlIndex.append(e.where($"vec_id" > maxId / 2), "vec_id", "embedding", dir)
    assert(MrlIndex.validateIndex(spark, dir,
      source = Some((e, "vec_id", "embedding"))) == e.count())

    // prefix drift: a source vector whose first-m slice changed
    val drift = intercept[IllegalStateException] {
      MrlIndex.validateIndex(spark, dir,
        source = Some((e.withColumn("embedding",
          when($"vec_id" === 4L,
            concat(array(element_at($"embedding", 1) + lit(0.5f)),
              slice($"embedding", 2, 63)))
            .otherwise($"embedding")), "vec_id", "embedding")))
    }
    assert(drift.getMessage.contains("first-m slice") &&
      drift.getMessage.contains("4"), drift.getMessage)

    // missing source row
    val dir2 = freshDir("vx-mrlmiss")
    MrlIndex.build(e.where($"vec_id" =!= 6L), "vec_id", "embedding",
      m = 16, dir2)
    val missing = intercept[IllegalStateException] {
      MrlIndex.validateIndex(spark, dir2,
        source = Some((e, "vec_id", "embedding")))
    }
    assert(missing.getMessage.contains("is not stored") &&
      missing.getMessage.contains("6"), missing.getMessage)

    // wrong-length prefix: a planted short row (structural — no source
    // needed, the recorded m is the contract)
    Seq((7L, Seq(1.0f, 2.0f)))
      .toDF("id", "pref").write.mode("append").parquet(s"$dir/prefix")
    val badLen = intercept[IllegalStateException] {
      MrlIndex.validateIndex(spark, dir)
    }
    assert(badLen.getMessage.contains("prefix length 2") &&
      badLen.getMessage.contains("7"), badLen.getMessage)
  }

  // ---------------------------------------------------------- sparse

  test("sparse validatePostings: green; mis-bucketed posting and orphan tombstone named") {
    val e = emb.limit(40)
    val sv = e.select($"vec_id",
      SparseSearch.sparsify($"embedding", Float.MinValue).as("sv"))
    val dir = freshDir("vx-sparse")
    SparseSearch.writePostings(
      SparseSearch.postings(sv, "vec_id", $"sv"), dir, buckets = 4)
    val n = SparseSearch.validatePostings(spark, dir)
    assert(n > 0)

    // orphan tombstone: a delete referencing no posting
    SparseSearch.deletePostings(spark, dir, Seq(999999L))
    val orphan = intercept[IllegalStateException] {
      SparseSearch.validatePostings(spark, dir)
    }
    assert(orphan.getMessage.contains("orphan delete") &&
      orphan.getMessage.contains("999999"), orphan.getMessage)

    // mis-bucketed posting: term filed under the wrong tb partition
    val dir2 = freshDir("vx-sparsemis")
    SparseSearch.writePostings(
      SparseSearch.postings(sv, "vec_id", $"sv"), dir2, buckets = 4)
    val one = spark.read.parquet(dir2)
      .select($"term", $"vec_id", $"w", $"tb").limit(1).collect().head
    Seq((one.getInt(0), one.getLong(1), one.getFloat(2),
        (one.getInt(3) + 1) % 4))
      .toDF("term", "vec_id", "w", "tb")
      .write.partitionBy("tb").mode("append").parquet(dir2)
    val misfiled = intercept[IllegalStateException] {
      SparseSearch.validatePostings(spark, dir2)
    }
    assert(misfiled.getMessage.contains("filed under bucket"),
      misfiled.getMessage)
  }

  test("sparse validatePostings: source cross-check re-derives every " +
      "weight — drift, orphan, missing all named; tombstones excused") {
    val e = emb.limit(40)
    val sv = e.select($"vec_id",
      SparseSearch.sparsify($"embedding", Float.MinValue).as("sv"))
    val dir = freshDir("vx-sparsesrc")
    SparseSearch.writePostings(
      SparseSearch.postings(sv, "vec_id", $"sv"), dir, buckets = 4)
    val src = Some((sv, "vec_id", "sv"))
    val n = SparseSearch.validatePostings(spark, dir, src)
    assert(n > 0)

    // a STORED weight that no longer re-derives (bit-flip class): an
    // internally-consistent posting row with a drifted w — the
    // structural checks can't see it, the source cross-check must
    val one = spark.read.parquet(dir)
      .select($"term", $"vec_id", $"w", $"tb").limit(1).collect().head
    val dirD = freshDir("vx-sparsedrift")
    SparseSearch.writePostings(
      SparseSearch.postings(sv, "vec_id", $"sv"), dirD, buckets = 4)
    Seq((one.getInt(0), one.getLong(1), one.getFloat(2) + 1.0f,
        one.getInt(3)))
      .toDF("term", "vec_id", "w", "tb")
      .write.partitionBy("tb").mode("append").parquet(dirD)
    val drift = intercept[IllegalStateException] {
      SparseSearch.validatePostings(spark, dirD, src)
    }
    assert(drift.getMessage.contains("does not re-derive"),
      drift.getMessage)

    // a source doc the index never posted: missing row
    val extra = sv.limit(1)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"sv")
    val missing = intercept[IllegalStateException] {
      SparseSearch.validatePostings(spark, dir,
        Some((sv.unionAll(extra), "vec_id", "sv")))
    }
    assert(missing.getMessage.contains("not posted"), missing.getMessage)

    // a posting whose source row is GONE: orphan — unless tombstoned
    // (table-first delete protocol), in which case it is excused
    val someId = sv.orderBy($"vec_id").head().getLong(0)
    val shrunk = Some((sv.where($"vec_id" =!= someId), "vec_id", "sv"))
    val orphan = intercept[IllegalStateException] {
      SparseSearch.validatePostings(spark, dir, shrunk)
    }
    assert(orphan.getMessage.contains("no source entry"),
      orphan.getMessage)
    SparseSearch.deletePostings(spark, dir, Seq(someId))
    assert(SparseSearch.validatePostings(spark, dir, shrunk) == n,
      "a tombstoned id whose table row is gone is a pending delete, " +
        "not corruption")
  }

  // ------------------------------------------------------------- ivf

  test("ivf validateIndex: green on build+append+delete; violations named") {
    val e = emb
    val dir = freshDir("vx-ivf")
    val maxId = e.agg(max($"vec_id")).head().getLong(0)
    IvfIndex.build(e.where($"vec_id" <= maxId / 2), "vec_id", "embedding",
      dir, nlists = 4)
    IvfIndex.append(e.where($"vec_id" > maxId / 2), "vec_id", "embedding", dir)
    assert(IvfIndex.validateIndex(spark, dir,
      source = Some((e, "vec_id", "embedding"))) == e.count())

    // a pending tombstone is excused from the missing-row direction;
    // after consolidate the row is gone physically and the SURVIVORS
    // validate clean
    IvfIndex.delete(spark, dir, Seq(maxId))
    assert(IvfIndex.validateIndex(spark, dir,
      source = Some((e, "vec_id", "embedding"))) == e.count())
    IvfIndex.consolidate(spark, dir)
    val survivors = e.where($"vec_id" =!= maxId)
    assert(IvfIndex.validateIndex(spark, dir,
      source = Some((survivors, "vec_id", "embedding"))) == survivors.count())

    // missing source row: the full table claims one more row than stored
    val missing = intercept[IllegalStateException] {
      IvfIndex.validateIndex(spark, dir,
        source = Some((e, "vec_id", "embedding")))
    }
    assert(missing.getMessage.contains("is not stored"), missing.getMessage)

    // mis-filed row: a planted row under a list its vector is not
    // nearest to (foreign id — source-independent structural check)
    val sample = spark.read.parquet(s"$dir/data")
      .select($"id", $"vec", $"list_id").limit(1).collect().head
    val wrongList = (sample.getInt(2) + 1) % 4
    Seq((999999L, sample.getSeq[Float](1), wrongList))
      .toDF("id", "vec", "list_id")
      .write.partitionBy("list_id").mode("append").parquet(s"$dir/data")
    val misfiled = intercept[IllegalStateException] {
      IvfIndex.validateIndex(spark, dir)
    }
    assert(misfiled.getMessage.contains("filed under list") &&
      misfiled.getMessage.contains("999999"), misfiled.getMessage)
  }

  // ----------------------------------------------------------- ivfpq

  test("ivfpq validateIndex: green on build+append; violations named") {
    val e = emb
    val dir = freshDir("vx-ivfpq")
    val maxId = e.agg(max($"vec_id")).head().getLong(0)
    IvfPqIndex.build(e.where($"vec_id" <= maxId / 2), "vec_id", "embedding",
      dir, nlists = 4, subvectors = 8, clusters = 16)
    IvfPqIndex.append(e.where($"vec_id" > maxId / 2), "vec_id", "embedding",
      dir)
    assert(IvfPqIndex.validateIndex(spark, dir,
      source = Some((e, "vec_id", "embedding"))) == e.count())

    // pending tombstone excused; consolidate applies it physically and
    // the SURVIVORS validate clean (one file per list afterwards)
    IvfPqIndex.delete(spark, dir, Seq(maxId))
    assert(IvfPqIndex.validateIndex(spark, dir,
      source = Some((e, "vec_id", "embedding"))) == e.count())
    IvfPqIndex.consolidate(spark, dir)
    val survivors = e.where($"vec_id" =!= maxId)
    assert(IvfPqIndex.validateIndex(spark, dir,
      source = Some((survivors, "vec_id", "embedding"))) == survivors.count())
    assert(IvfPqIndex.fileCount(spark, dir) <= 4) // one per list

    // codec drift: a source vector whose codes no longer re-derive
    val drift = intercept[IllegalStateException] {
      IvfPqIndex.validateIndex(spark, dir,
        source = Some((perturbed(survivors, 2L), "vec_id", "embedding")))
    }
    assert(drift.getMessage.contains("do not re-derive") &&
      drift.getMessage.contains("2"), drift.getMessage)

    // out-of-range code: reads garbage LUT cells — planted foreign row
    val sample = spark.read.parquet(s"$dir/data")
      .select($"id", $"codes", $"list_id").limit(1).collect().head
    Seq((999999L, Seq.fill(8)(16.toShort), sample.getInt(2)))
      .toDF("id", "codes", "list_id")
      .write.partitionBy("list_id").mode("append").parquet(s"$dir/data")
    val badCode = intercept[IllegalStateException] {
      IvfPqIndex.validateIndex(spark, dir)
    }
    assert(badCode.getMessage.contains("codebook range") &&
      badCode.getMessage.contains("999999"), badCode.getMessage)

    // missing source row
    val dir2 = freshDir("vx-ivfpqmiss")
    IvfPqIndex.build(e.where($"vec_id" =!= 8L), "vec_id", "embedding",
      dir2, nlists = 4, subvectors = 8, clusters = 16)
    val missing = intercept[IllegalStateException] {
      IvfPqIndex.validateIndex(spark, dir2,
        source = Some((e, "vec_id", "embedding")))
    }
    assert(missing.getMessage.contains("is not stored") &&
      missing.getMessage.contains("8"), missing.getMessage)
  }

  // -------------------------------------------------------------- pq

  test("pq validateIndex: green on build+append; violations named") {
    val e = emb
    val dir = freshDir("vx-pq")
    val maxId = e.agg(max($"vec_id")).head().getLong(0)
    val cb = graft.pq.ProductQuantizer.trainCodebook(
      e.where($"vec_id" <= maxId / 2), "embedding",
      subvectors = 8, clusters = 16)
    PqAnnIndex.build(e.where($"vec_id" <= maxId / 2), "vec_id", "embedding",
      dir, cb, AnnParams(m = 8, efConstruction = 64, numPartitions = 2))
    PqAnnIndex.append(e.where($"vec_id" > maxId / 2), "vec_id", "embedding",
      dir)
    assert(PqAnnIndex.validateIndex(spark, dir,
      source = Some((e, "vec_id", "embedding"))) == e.count())

    // codes drift: a source vector whose codes no longer re-derive
    val drift = intercept[IllegalStateException] {
      PqAnnIndex.validateIndex(spark, dir,
        source = Some((perturbed(e, 1L), "vec_id", "embedding")))
    }
    assert(drift.getMessage.contains("do not re-derive") &&
      drift.getMessage.contains("1"), drift.getMessage)

    // duplicate label across shards: append the same rows again
    val dir2 = freshDir("vx-pqdup")
    PqAnnIndex.build(e.where($"vec_id" <= 10), "vec_id", "embedding",
      dir2, cb, AnnParams(m = 8, efConstruction = 64, numPartitions = 1))
    PqAnnIndex.append(e.where($"vec_id" === 3L), "vec_id", "embedding", dir2)
    val dup = intercept[IllegalStateException] {
      PqAnnIndex.validateIndex(spark, dir2)
    }
    assert(dup.getMessage.contains("duplicate label"), dup.getMessage)

    // header incoherence: a shard from a FOREIGN codebook smuggled in
    val dir3 = freshDir("vx-pqhdr")
    val cb2 = graft.pq.ProductQuantizer.trainCodebook(
      e.where($"vec_id" > maxId / 2), "embedding",
      subvectors = 8, clusters = 8)
    PqAnnIndex.build(e.where($"vec_id" > maxId / 2), "vec_id", "embedding",
      dir3, cb2, AnnParams(m = 8, efConstruction = 64, numPartitions = 1))
    val foreign = new java.io.File(s"$dir3/graphs").listFiles()
      .filter(_.getName.endsWith(".pqhnsw")).head
    java.nio.file.Files.copy(foreign.toPath,
      java.nio.file.Paths.get(s"$dir/graphs/part-zzzz-00000.pqhnsw"))
    val hdr = intercept[IllegalStateException] {
      PqAnnIndex.validateIndex(spark, dir)
    }
    assert(hdr.getMessage.contains("headers disagree"), hdr.getMessage)
  }

  test("hnsw validateIndex: QUANTIZED storage re-derives through the " +
      "snap round-trip — drift is a named violation, not a blind spot") {
    for (quant <- Seq("i8", "f16", "b4")) {
      val e = emb.limit(60)
      val dir = freshDir(s"vx-hq-$quant")
      AnnIndex.build(e, "vec_id", "embedding", dir,
        AnnParams(m = 8, efConstruction = 64, numPartitions = 2,
          quant = quant))
      assert(AnnIndex.validateIndex(spark, dir,
        source = Some((e, "vec_id", "embedding"))) == e.count(),
        s"quant=$quant must validate in full against its source")
      // a whole-vector +10 shift crosses every quant level boundary
      val drift = intercept[IllegalStateException] {
        AnnIndex.validateIndex(spark, dir,
          source = Some((perturbed(e, 3L), "vec_id", "embedding")))
      }
      assert(drift.getMessage.contains("does not re-derive") &&
        drift.getMessage.contains(s"quant=$quant"), drift.getMessage)
    }
  }

  // -------------------------------------------------------- multivec

  test("multivec validateIndex: source cross-check re-derives every " +
      "stored token — drift, orphan, missing named; tombstones excused") {
    import graft.ops.MultiVec
    val e = emb.limit(40)
    val flat = MultiVec.tokens(e, "vec_id", "embedding", 4)
    val dir = freshDir("vx-mvsrc")
    MultiVec.writeIndex(flat, dir, nlists = 8)
    val docs = MultiVec.docArrays(flat).persist()
    try {
      val src = Some((docs, "mdoc", "toks"))
      val n = MultiVec.validateIndex(spark, dir, src)
      // tokens() groups 4 consecutive ids into one doc: 40 source rows
      // = 10 docs x 4 tokens = 40 postings
      assert(n == e.count())

      // a stored token that no longer matches its source (bit-flip
      // class): perturb ONE source token — the structural cent/i8
      // checks re-derive from the STORED token and stay green, so only
      // the source cross-check can catch the divergence
      val victim = docs.orderBy($"mdoc").head().getLong(0)
      val drifted = docs.withColumn("toks",
        when($"mdoc" === victim,
          transform($"toks", t => transform(t, x => x + lit(1.0f))))
          .otherwise($"toks"))
      val drift = intercept[IllegalStateException] {
        MultiVec.validateIndex(spark, dir, Some((drifted, "mdoc", "toks")))
      }
      assert(drift.getMessage.contains("does not re-derive"),
        drift.getMessage)

      // an internally-consistent FOREIGN posting (orphan): valid cent
      // and i8 for its token, but no source token to re-derive from
      val dirO = freshDir("vx-mvorph")
      MultiVec.writeIndex(flat, dirO, nlists = 8)
      val one = spark.read.parquet(s"$dirO/postings")
        .select($"mdoc", $"t_idx", $"tok", $"tok_i8", $"cent")
        .limit(1).collect().head
      Seq((one.getLong(0), 99,
          one.getSeq[Float](2), one.getSeq[Byte](3), one.getInt(4)))
        .toDF("mdoc", "t_idx", "tok", "tok_i8", "cent")
        .write.partitionBy("cent").mode("append")
        .parquet(s"$dirO/postings")
      val orphan = intercept[IllegalStateException] {
        MultiVec.validateIndex(spark, dirO, src)
      }
      assert(orphan.getMessage.contains("no source token"),
        orphan.getMessage)

      // a source doc the index never posted: missing row
      val extra = docs.limit(1)
        .select(($"mdoc" + 1000000L).as("mdoc"), $"toks")
      val missing = intercept[IllegalStateException] {
        MultiVec.validateIndex(spark, dir,
          Some((docs.unionAll(extra), "mdoc", "toks")))
      }
      assert(missing.getMessage.contains("not posted"),
        missing.getMessage)

      // table-first delete: the doc's source row is gone but its
      // postings are tombstoned — a pending delete, not corruption
      val shrunk = Some((docs.where($"mdoc" =!= victim), "mdoc", "toks"))
      val orphan2 = intercept[IllegalStateException] {
        MultiVec.validateIndex(spark, dir, shrunk)
      }
      assert(orphan2.getMessage.contains("no source token"))
      MultiVec.deleteDocs(spark, dir, Seq(victim))
      assert(MultiVec.validateIndex(spark, dir, shrunk) == n)
    } finally { docs.unpersist(); () }
  }
}
