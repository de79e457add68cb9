package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Benchmark-decontamination operator: broadcast-set overlap counts vs
  * a brute-force shingle-intersection oracle, flag semantics, and the
  * zero-shuffle plan shape. */
class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private def shingleSet(text: String, n: Int): Set[String] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  private val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "pack my box with five dozen liquor jugs"))
  private val corpus = Seq(
    (1L, "a quick brown fox ran away"), // shares "quick brown fox"
    (2L, "the quick brown fox jumps high today"), // shares 3 trigrams
    (3L, "nothing in common with anything here"),
    (4L, "five dozen liquor jugs on my shelf"), // shares 2 trigrams
    (5L, "fox")) // under n tokens → no shingles

  test("counts equal brute-force distinct shingle intersection") {
    val benchDf = bench.toDF("doc_id", "text")
    val corpusDf = corpus.toDF("doc_id", "text")
    val got = Decontaminate
      .flag(corpusDf, "text", benchDf, "text", n = 3, minOverlap = 2)
      .select("doc_id", "n_contaminated", "flagged")
      .as[(Long, Int, Boolean)].collect().sortBy(_._1)

    val benchSh = bench.flatMap(b => shingleSet(b._2, 3)).toSet
    val want = corpus.map { case (id, t) =>
      val c = (shingleSet(t, 3) & benchSh).size
      (id, c, c >= 2)
    }.sortBy(_._1)
    assert(got.toSeq == want, s"got ${got.toSeq}")
    assert(want.exists(_._3) && want.exists(w => !w._3 && w._2 > 0),
      "fixture must cover flagged, contaminated-but-unflagged and clean")
  }

  test("plan is map-side only: no shuffle, no explode, codegen'd") {
    // parquet-backed so the plan is a real scan, not a LocalTableScan
    val dir = java.nio.file.Files.createTempDirectory("decon").toString
    corpus.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val benchDf = bench.toDF("doc_id", "text")
    val set = Decontaminate.benchmarkShingles(benchDf, "text", 3)
    val df = spark.read.parquet(dir).select(
      col("doc_id"),
      Decontaminate.contaminationCount(col("text"), set, 3).as("c"))
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    assert(!s.contains("Exchange"), s)
    assert(!s.contains("Generate"), s)
    assert(plan.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.WholeStageCodegenExec]), s)
  }

  test("null text is clean (count 0, flagged false), never NULL-dropped") {
    val benchDf = bench.toDF("doc_id", "text")
    val corpusDf = Seq((1L, Some("totally unrelated words in this row")),
      (2L, None: Option[String])).toDF("doc_id", "text")
    val rows = Decontaminate.flag(corpusDf, "text", benchDf, "text", n = 3)
      .select("doc_id", "n_contaminated", "flagged")
      .as[(Long, Int, Boolean)].collect().sortBy(_._1)
    assert(rows.length == 2, rows.toSeq)
    assert(rows(1) == ((2L, 0, false)), rows.toSeq)
    // the documented clean-corpus filter keeps the null-text row
    assert(Decontaminate.flag(corpusDf, "text", benchDf, "text", n = 3)
      .where(!col("flagged")).count() == 2)
  }

  test("empty benchmark set leaves every document clean") {
    val benchDf = Seq((1L, "xy")).toDF("doc_id", "text") // < n tokens
    val corpusDf = corpus.toDF("doc_id", "text")
    val flagged = Decontaminate
      .flag(corpusDf, "text", benchDf, "text", n = 3)
      .where(col("n_contaminated") > 0).count()
    assert(flagged == 0)
  }

  test("maxBenchSimilarity: hand-computed cosines, dim mismatch skipped") {
    val bench = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(1f, 1f, 1f))) // wrong dim — must be ignored
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(2f, 0f)), // cos 1.0 with bench 1
      (11L, Array(1f, 1f)), // cos √2/2 with both
      (12L, Array(-3f, 0f))) // cos -1 / 0 → best 0 with bench 2
      .toDF("vec_id", "embedding")
    val set = Decontaminate.benchmarkEmbeddings(bench, "embedding")
    val got = corpus
      .select(col("vec_id"),
        round(Decontaminate.maxBenchSimilarity(col("embedding"), set), 4)
          .as("s"))
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((10L, 1.0), (11L, 0.7071), (12L, 0.0)))
  }
}
