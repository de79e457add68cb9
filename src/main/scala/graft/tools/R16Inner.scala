package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Inner-plan evidence for the r16 optimization round: the ok-row
  * gates return a constant row (their committed `_before/_after`
  * plans are LocalTableScan by design), so this dumps the SERVING
  * plans the round's claims are actually about:
  *
  *  - `export_tokenized_inner_{before,after}.txt` — the packing
  *    dataflow without / with the one-pass encode materialization
  *    (the only r16 change that alters a plan: the running total's
  *    passes re-derived the whole BPE-encode subtree before, and scan
  *    the checkpointed relation after);
  *  - `<gate>_inner.txt` — representative planner-gate serving forms
  *    (bq filtered, maxsim scalar), UNCHANGED by the round: the
  *    concurrency work schedules these probes, it does not rewrite
  *    them.
  *
  * Run from the repo root: `runMain graft.tools.R16Inner <sfDir>`.
  */
object R16Inner {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File("plans/r16").mkdirs()
    def dump(name: String, df: DataFrame): Unit = {
      Files.writeString(Paths.get(s"plans/r16/$name.txt"),
        graft.ops.MaskedExplain.explain(df, "formatted"))
      println(s"[r16inner] wrote plans/r16/$name.txt")
    }

    // ---- export_tokenized packing dataflow, before/after
    locally {
      import graft.text.BpeTrainer
      val docs = Tables.documents(spark, dir).where(col("text").isNotNull)
      val merges = BpeTrainer.train(docs, "text", 48)
      val vocab = BpeTrainer.vocabulary(
        merges, BpeTrainer.corpusAlphabet(docs, "text"))
      def blocksOf(ids: DataFrame) = graft.ops.Packing
        .assignBlocks(ids, size(col("ids")), 128, Seq(col("doc_id")))
        .select(col("doc_id"), size(col("ids")).as("n"),
          col("start_token"), col("first_block"), col("last_block"))
        .orderBy("doc_id")
      val rawIds = docs
        .select(col("doc_id"),
          BpeTrainer.encodeIds(col("text"), merges, vocab).as("ids"))
        .where(size(col("ids")) > 0)
      dump("export_tokenized_inner_before", blocksOf(rawIds))
      dump("export_tokenized_inner_after", blocksOf(rawIds.localCheckpoint()))
    }

    // ---- representative planner-gate serving forms (plan-invariant
    // under the r16 concurrency change; committed to prove it)
    locally {
      import graft.plans.AnnCatalog
      val e = Tables.embeddings(spark, dir)
      val q = e.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).toArray
      val tablePath = s"$dir/embeddings.parquet"
      val bqPath = java.nio.file.Files
        .createTempDirectory("graft-r16bq").toString + "/idx"
      graft.ann.BqIndex.build(e, "vec_id", "embedding", bqPath)
      AnnCatalog.register(spark, tablePath, AnnCatalog.IndexMeta(
        bqPath, "vec_id", "embedding", "l2sq", ef = 768, kind = "bq"))
      try dump("knn_bq_filtered_planner_inner",
        e.where(col("vec_id") % 3 === 0)
          .orderBy(graft.functions.l2sq_dist(col("embedding"), lit(q)))
          .limit(10))
      finally AnnCatalog.unregister(spark, tablePath)
    }
    spark.stop()
  }
}
