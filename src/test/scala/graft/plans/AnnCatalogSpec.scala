package graft.plans

import graft.SparkTestBase

/** [[AnnCatalog.describe]] — the `ldb_get_indexes` analog (reference
  * lantern_hnsw/test/sql/utils/common.sql:17-42): one row per
  * registration, definition knobs round-trip, artifact footprint from
  * the filesystem, rows filterable by table. */
class AnnCatalogSpec extends SparkTestBase {

  test("describe lists registrations with footprint and definition") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cat").toString
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
}
