package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.l2sq_dist

class AnnCatalogSpec extends SparkTestBase {

  test("save/load round-trips registrations and the planner still fires") {
    import graft.ann.{AnnIndex, AnnParams}
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val idx = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-cat").toFile, "idx").toString
    AnnIndex.build(e, "vec_id", "embedding", idx,
      AnnParams(m = 8, efConstruction = 64, ef = 64, numPartitions = 2))
    val tablePath = s"$dir/embeddings.parquet"
    val catFile = java.nio.file.Files
      .createTempDirectory("graft-catf").toString + "/catalog.json"
    try {
      AnnCatalog.register(spark, tablePath,
        AnnCatalog.IndexMeta(idx, "vec_id", "embedding", "l2sq", ef = 64))
      AnnCatalog.register(spark, tablePath,
        AnnCatalog.IndexMeta(idx, "vec_id", "embedding", "cos", ef = 32,
          kind = "ivf", nprobe = 4))
      AnnCatalog.save(spark, catFile)

      // simulate a fresh session: catalog cleared, planner stops firing
      AnnCatalog.unregister(spark, tablePath)
      val q = e.select("embedding").head().getSeq[Float](0).toArray
      def knn = e.select(col("vec_id"), col("embedding"))
        .orderBy(l2sq_dist(col("embedding"), lit(q))).limit(5)
      assert(knn.queryExecution.optimizedPlan.collect {
        case a: AnnScanLogical => a
      }.isEmpty)

      val n = AnnCatalog.load(spark, catFile)
      assert(n == 2)
      // both metas restored with their fields
      val fsPath = new org.apache.hadoop.fs.Path(tablePath)
      val qualified = fsPath.getFileSystem(
        spark.sparkContext.hadoopConfiguration).makeQualified(fsPath)
      val cosMeta = AnnCatalog.lookup(Seq(qualified), "embedding", "cos")
      assert(cosMeta.exists(m =>
        m.kind == "ivf" && m.nprobe == 4 && m.ef == 32 && m.artifact == idx))
      // and the optimizer fires again off the loaded catalog
      assert(knn.queryExecution.optimizedPlan.collect {
        case a: AnnScanLogical => a
      }.nonEmpty)
      assert(knn.select("vec_id").collect().nonEmpty)

      // load is idempotent (replace-by-(vecCol, metric), not duplicate)
      AnnCatalog.load(spark, catFile)
      assert(AnnCatalog.lookup(Seq(qualified), "embedding", "cos").size == 1)
    } finally AnnCatalog.unregister(spark, tablePath)
  }

  /** [[AnnCatalog.describe]] — the `ldb_get_indexes` analog (reference
    * lantern_hnsw/test/sql/utils/common.sql:17-42): one row per
    * registration, definition knobs round-trip, artifact footprint from
    * the filesystem, rows filterable by table. */
  test("describe lists registrations with footprint and definition") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-catd").toString
    val tableA = s"$tmp/tableA.parquet"
    val tableB = s"$tmp/tableB.parquet"
    val artifact = s"$tmp/artifact"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(artifact))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$artifact/part-0"), Array[Byte](1, 2, 3))

    AnnCatalog.register(spark, tableA, AnnCatalog.IndexMeta(
      artifact, "id", "v", "l2sq", ef = 64, kind = "hnsw"))
    AnnCatalog.register(spark, tableA, AnnCatalog.IndexMeta(
      s"$tmp/missing", "id", "v", "cos", ef = 32, kind = "ivf", nprobe = 4))
    AnnCatalog.register(spark, tableB, AnnCatalog.IndexMeta(
      artifact, "id", "v", "l2sq", ef = 16, kind = "bq"))
    try {
      val all = AnnCatalog.describe(spark).collect()
      val mine = all.filter(_.getString(0).contains(tmp))
      assert(mine.length == 3)

      val a = AnnCatalog.describe(spark, table = Some(tableA)).collect()
      assert(a.length == 2)
      // sorted by (vec_col, metric): cos row first
      val ivfRow = a(0)
      assert(ivfRow.getAs[String]("kind") == "ivf" &&
        ivfRow.getAs[Int]("nprobe") == 4 &&
        ivfRow.getAs[Long]("files") == 0L &&
        ivfRow.getAs[Long]("bytes") == 0L)
      assert(ivfRow.getAs[String]("definition")
        .contains("USING ivf (v cos) WITH (ef=32, nprobe=4)"))
      val hnswRow = a(1)
      assert(hnswRow.getAs[String]("kind") == "hnsw" &&
        hnswRow.getAs[Long]("files") == 1L &&
        hnswRow.getAs[Long]("bytes") == 3L)
      assert(hnswRow.getAs[String]("definition")
        .contains("USING hnsw (v l2sq) WITH (ef=64)"))

      val b = AnnCatalog.describe(spark, table = Some(tableB)).collect()
      assert(b.length == 1 && b(0).getAs[String]("kind") == "bq")
    } finally {
      AnnCatalog.unregister(spark, tableA)
      AnnCatalog.unregister(spark, tableB)
    }
    assert(AnnCatalog.describe(spark, table = Some(tableA)).isEmpty)
  }

  /** [[AnnCatalog.unregisterOne]] — per-index lock granularity: lifting
    * one registration must leave siblings visible AND must not revert a
    * sibling's concurrent update on restore (the retune truth-pass
    * contract). */
  test("unregisterOne drops exactly one meta and leaves siblings intact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cat1").toString
    val table = s"$tmp/t.parquet"
    val mv = AnnCatalog.IndexMeta(s"$tmp/mv", "id", "toks", "maxsim",
      ef = 4, kind = "multivec", nprobe = 1)
    val bq = AnnCatalog.IndexMeta(s"$tmp/bq", "id", "v", "l2sq",
      ef = 8, kind = "bq")
    AnnCatalog.register(spark, table, mv)
    AnnCatalog.register(spark, table, bq)
    try {
      // lift the multivec meta only
      val lifted = AnnCatalog.unregisterOne(spark, table, "toks", "maxsim")
      assert(lifted.contains(mv))
      assert(AnnCatalog.metaFor(spark, table, "toks", "maxsim").isEmpty)
      // the sibling stays visible to the planner throughout
      assert(AnnCatalog.metaFor(spark, table, "v", "l2sq").contains(bq))
      // a sibling update landing while the meta is lifted...
      AnnCatalog.register(spark, table, bq.copy(ef = 128))
      // ...survives the restore (register puts back ONLY the lifted meta)
      lifted.foreach(AnnCatalog.register(spark, table, _))
      assert(AnnCatalog.metaFor(spark, table, "v", "l2sq").get.ef == 128)
      assert(AnnCatalog.metaFor(spark, table, "toks", "maxsim").contains(mv))
      // lifting a meta that is not registered returns None, no change
      assert(AnnCatalog.unregisterOne(spark, table, "nope", "cos").isEmpty)
      assert(AnnCatalog.metasFor(spark, table).size == 2)
      // lifting the LAST meta drops the table key entirely
      AnnCatalog.unregisterOne(spark, table, "toks", "maxsim")
      AnnCatalog.unregisterOne(spark, table, "v", "l2sq")
      assert(AnnCatalog.metasFor(spark, table).isEmpty)
    } finally AnnCatalog.unregister(spark, table)
  }
}
