package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: step the pq_delete gate's conditions one by one. */
object PqDelDbg {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ann.{AnnParams, PqAnnIndex}
    import graft.plans.{AnnCatalog, AnnScanLogical}
    import graft.pq.ProductQuantizer
    val e = graft.Tables.embeddings(spark, dir)
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-pqdbg").toString + "/idx"
    val lower = e.where(col("vec_id") <= maxId / 2)
    val cb = ProductQuantizer.trainCodebook(
      lower, "embedding", subvectors = 8, clusters = 64)
    PqAnnIndex.build(lower, "vec_id", "embedding", path, cb,
      AnnParams(m = 16, efConstruction = 128, ef = 128, numPartitions = 4))
    PqAnnIndex.append(e.where(col("vec_id") > maxId / 2), "vec_id",
      "embedding", path)
    val upId = maxId
    val upVec = e.where(col("vec_id") === upId).select("embedding")
      .head().getSeq[Float](0).toArray
    val appendedFound = PqAnnIndex
      .searchRerank(e, "vec_id", "embedding", path, upVec, k = 10, ef = 128)
      .exists(_._1 == upId)
    println(s"appendedFound=$appendedFound")
    val victim = e.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("embedding")).head()
    val vid = victim.getLong(0)
    val vvec = victim.getSeq[Float](1).toArray
    val before = PqAnnIndex.search(spark, path, vvec, k = 5, ef = 128)
    println(s"vid=$vid foundBefore=${before.exists(_._1 == vid)} " +
      s"before=${before.take(5).mkString(",")}")
    PqAnnIndex.delete(spark, path, Seq(vid))
    val after = PqAnnIndex.search(spark, path, vvec, k = 5, ef = 128)
    println(s"goneFromSearch=${after.nonEmpty && !after.exists(_._1 == vid)}")
    println(s"goneFromVectors=${PqAnnIndex.vectors(spark, path)
      .where(col("id") === vid).isEmpty}")
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(spark, tablePath,
      AnnCatalog.IndexMeta(path, "vec_id", "embedding", "l2sq",
        ef = 512, kind = "pq"))
    try {
      val knn = e.orderBy(
        graft.functions.l2sq_dist(col("embedding"), lit(vvec))).limit(10)
      val planned = knn.queryExecution.optimizedPlan.collect {
        case a: AnnScanLogical if a.kind == "pq" => a
      }.nonEmpty
      val got = knn.select("vec_id").collect().map(_.getLong(0)).toSet
      val truth = graft.ops.VectorSearch.exact(
          e.where(col("vec_id") =!= vid), col("embedding"), vvec, 10,
          "l2sq", tieBreak = Seq(col("vec_id")))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      println(s"plannedOk=$planned plannerGone=${!got.contains(vid)} " +
        s"overlap=${got.intersect(truth).size} got=${got.toSeq.sorted.take(12)}")
    } finally AnnCatalog.unregister(spark, tablePath)
    PqAnnIndex.consolidate(spark, path, numPartitions = 4)
    val cons = PqAnnIndex.search(spark, path, vvec, k = 5, ef = 128)
    println(s"goneAfterCons=${cons.nonEmpty && !cons.exists(_._1 == vid)}")
    val survivors = e.where(col("vec_id") =!= vid)
    val v = PqAnnIndex.validateIndex(spark, path,
      source = Some((survivors, "vec_id", "embedding")))
    println(s"consValid=${v == survivors.count()} validated=$v")
    spark.stop()
  }
}
