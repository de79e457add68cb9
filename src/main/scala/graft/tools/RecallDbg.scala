package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.RecallProtocol

/** Dev tool: mean recall@10 of the IVF / IVF-PQ holdout gates as a
  * function of nprobe, at one sf dir. */
object RecallDbg {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, sfDir)
    val h = RecallProtocol.holdout(e)
    val exact = RecallProtocol.truth(h.queriesDf, h.base, "vec_id", "embedding")

    def tmp(tag: String) = java.nio.file.Files
      .createTempDirectory(s"graft-rdbg-$tag").toString + "/idx"
    val ivfPath = tmp("ivf")
    graft.ann.IvfIndex.build(h.base, "vec_id", "embedding", ivfPath, nlists = 16)
    Seq(8, 10, 12, 14, 16).foreach { np =>
      val ann = RecallProtocol.perQueryDf(graft.ann.IvfIndex
        .searchMany(spark, ivfPath, h.queries.toSeq, k = 10, nprobe = np))
      println(f"[recalldbg] ivf nprobe=$np mean=${RecallProtocol.meanRecall(ann, exact)}%.3f")
    }

    val pqPath = tmp("ivfpq")
    graft.ann.IvfPqIndex.build(h.base, "vec_id", "embedding", pqPath,
      nlists = 16, subvectors = 8, clusters = 64)
    for (np <- Seq(8, 10, 12, 16); ef <- Seq(256, 512)) {
      val ann = RecallProtocol.perQueryDf(graft.ann.IvfPqIndex
        .searchMany(spark, pqPath, h.queries.toSeq, k = 10, nprobe = np,
          ef = ef, rerank = Some((h.base, "vec_id", "embedding"))))
      println(f"[recalldbg] ivfpq nprobe=$np ef=$ef mean=${RecallProtocol.meanRecall(ann, exact)}%.3f")
    }
    spark.stop()
  }
}
