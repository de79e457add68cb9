package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.MultiVec
import graft.queries.RecallProtocol

/** Dev tool: PLAID gate diagnostics — mean recall margin and candidate
  * fraction per sf dir, plus stage timings. Not part of the library.
  */
object MvDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      def t[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[mvdbg] $dir $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
      }
      val toks = MultiVec.tokens(Tables.embeddings(spark, dir), "vec_id", "embedding", 4)
      val q = MultiVec.queryToks(toks, (0L until 8L))
      val corpus = toks.where(col("mdoc") >= 8).cache()
      val exact = t("exact") { RecallProtocol.perQuery(
        MultiVec.topKPerQuery(MultiVec.scoreFlat(corpus, q), 10)
          .select("q_mdoc", "mdoc").collect()
          .map(r => (r.getLong(0), r.getLong(1)))) }
      val nDocs = corpus.select("mdoc").distinct().count()
      val cents = t("kmeans") { MultiVec.trainCentroids(toks, 64) }
      val assigned = MultiVec.assign(corpus, cents)
      val probes = MultiVec.probeSets(q, cents, 16)
      val approx = t("approx") {
        MultiVec.approxScores(assigned, q, probes).count() }
      val pairs = t("pairs") { MultiVec.candidatePairs(
        MultiVec.approxScores(assigned, q, probes), 64).count() }
      val mem = t("mem-plaid") { MultiVec.topKPerQuery(
        MultiVec.plaidSearch(assigned, q, probes, 64), 10).collect() }
      val dirOut = java.nio.file.Files.createTempDirectory("mvdbg").toString + "/post"
      t("write") { MultiVec.writeTokenPostings(assigned, dirOut) }
      val disk = t("disk-plaid") { MultiVec.topKPerQuery(
        MultiVec.plaidSearchOnDisk(spark, dirOut, q, probes, 64), 10).collect() }
      val ann = RecallProtocol.perQuery(
        mem.map(r => (r.getLong(0), r.getLong(1))))
      println(f"[mvdbg] $dir recall=${RecallProtocol.meanRecall(ann, exact)}%.4f " +
        f"candFrac=${pairs.toDouble / (nDocs * 8)}%.3f approxRows=$approx " +
        s"mem=${mem.length} disk=${disk.length} eq=${mem.toSet == disk.toSet}")
      corpus.unpersist()
    }
    spark.stop()
  }
}
