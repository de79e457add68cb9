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
}
