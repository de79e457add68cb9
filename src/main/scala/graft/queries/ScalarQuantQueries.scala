package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pq.ScalarQuantizer

/** Driver-checkable query for scalar quantization (SURVEY.md §2.3,
  * quant_bits → i8). The i8 encode/decode formulas are tie-free
  * (floor(x+0.5)) so DuckDB reproduces them bit-for-bit; f16/b1 are
  * golden-tested in ScalarQuantSpec (IEEE bit tricks aren't SQL).
  */
object ScalarQuantQueries {

  private def quantI8(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val codes = ScalarQuantizer.quantize_i8(col("embedding"))
    val deq = ScalarQuantizer.dequantize_i8(codes)
    e.select(
        col("vec_id"),
        element_at(codes, 1).cast("int").as("c0"),
        element_at(codes, 2).cast("int").as("c1"),
        element_at(codes, 3).cast("int").as("c2"),
        round(element_at(deq, 1).cast("double"), 4).as("d0"))
      .orderBy("vec_id")
  }

  private val oracle: String = {
    def clamp(x: String) = s"LEAST(GREATEST(CAST($x AS DOUBLE), -1.0), 1.0)"
    def code(j: Int) =
      s"CAST(LEAST(GREATEST(floor((${clamp(s"embedding[${j + 1}]")} + 1.0) * 127.5 + 0.5) - 128, -128), 127) AS INT)"
    s"""SELECT vec_id,
       |${code(0)} AS c0, ${code(1)} AS c1, ${code(2)} AS c2,
       |round(-1.0 + (${code(0)} + 128) * 2.0 / 255.0, 4) AS d0
       |FROM embeddings ORDER BY vec_id""".stripMargin
  }

  /** Binary-quantization RESCORE gate — the retrieval pattern the b1
    * kind exists for ([[graft.ops.BqSearch]]): sign-bit signatures are
    * packed ONCE into a parquet bits artifact (dim/32 ints — the 32×
    * scan reduction), the per-dimension centering vector is persisted
    * WITH it (it is part of the codec), and search runs the prepacked
    * scale path: hamming pre-rank over the bits table only, exact
    * rescore touching float vectors for queries × pool rows alone.
    * Multi-query protocol ([[RecallProtocol]]): 50 held-out queries,
    * mean recall@10 ≥ 0.8 vs the exact full-precision top-10 (measured
    * 1.0 at sf0.01 / 0.91 at sf0.1 with pool = 384 — near-random
    * embeddings are BQ's worst case, so the margin is real), every
    * rescored distance equal to the TRUE l2sq (distsTrue), and stage 1
    * planned with the codegen'd `hamming_dist` + partial
    * WindowGroupLimit (no ScalaUDF anywhere). */
  private def bqRescoreRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.BqSearch
    val e = Tables.embeddings(s, dir)
    val h = RecallProtocol.holdout(e)
    val root = AnnQueries.artifactDir("bqbits", dir, "embeddings")
    AnnQueries.cached(root) {
      val center = BqSearch.fitCenter(h.base, "embedding")
      Seq(center.toSeq).toDF("center")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/center")
      h.base.select(col("vec_id"),
          BqSearch.pack(col("embedding"), center).as("bits"))
        .write.mode("overwrite").parquet(s"$root/tbl")
    }
    val center = s.read.parquet(s"$root/center")
      .head().getSeq[Float](0).toArray
    val bits = s.read.parquet(s"$root/tbl")
    val annDf = BqSearch.topKManyPrepacked(
      bits, "vec_id", "bits", h.base, "embedding", h.queries.toSeq,
      k = 10, pool = 384, metric = "l2sq", center = center)
    val exactF = RecallProtocol.async(
      RecallProtocol.truth(h.queriesDf, h.base, "vec_id", "embedding"))
    val plan = graft.ops.MaskedExplain.explain(annDf, "formatted")
    val planOk = plan.contains("hamming_dist") &&
      plan.contains("WindowGroupLimit") && !plan.contains("ScalaUDF")
    val exact = exactF()
    val distOk = RecallProtocol.distsTrue(
      annDf, h.queriesDf, h.base, "vec_id", "embedding")
    if (planOk && distOk &&
        RecallProtocol.meanRecallOk(RecallProtocol.perQueryDf(annDf), exact))
      Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  /** Streaming `aminsert` twin for the bq artifact: the index is built
    * over the lower half of the table, the upper half arrives through
    * a genuine parquet FILE source in three micro-batches
    * ([[StreamChunks]]), each batch packed with the PERSISTED center
    * (the codec fixed at build time) and appended as new parquet
    * files. Gate: the post-append prepacked search over the COMPLETE
    * corpus reaches mean recall@10 ≥ 0.8 against the exact full-table
    * truth, and streamed-range ids actually surface in the answers
    * wherever the exact truth contains them. */
  private def streamingBqInsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.BqIndex
    import graft.ops.BqSearch
    val e = Tables.embeddings(s, dir)
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-sbq").toString + "/idx"
    // the exact truth never touches the index artifact — overlap it
    // with the whole build + stream chain below
    val qs = e.orderBy(col("vec_id")).limit(RecallProtocol.QueryCount)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qDf = e.where(col("vec_id") <= qs.map(_._1).max)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exactF = RecallProtocol.async(
      RecallProtocol.truth(qDf, e, "vec_id", "embedding"))
    BqIndex.build(e.where(col("vec_id") <= maxId / 2), "vec_id", "embedding",
      path)
    val base = e.where(col("vec_id") > maxId / 2)
      .select(col("vec_id"), col("embedding"))
    val lo = maxId / 2 + 1
    val width = (maxId - lo) / 3 + 1
    val chunkRoot = AnnQueries.artifactDir("sbqins", dir, "embeddings")
    val files = StreamChunks.materialize(chunkRoot,
      (0 until 3).map { c => () =>
        base.where(col("vec_id") >= lo + c * width &&
          col("vec_id") < lo + (c + 1) * width)
      })
    val (streamDir, src) = StreamChunks.source(s, base.schema)
    val q = src.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) BqIndex.append(b, "vec_id", "embedding", path)
      }
      .start()
    StreamChunks.drive(q, streamDir, files)

    val ann = RecallProtocol.perQueryDf(BqSearch.topKManyPrepacked(
      BqIndex.liveBits(s, path), "id", "bits",
      e.select(col("vec_id").as("id"), col("embedding")), "embedding",
      qs.toSeq, k = 10, pool = 384, center = BqIndex.center(s, path)))
    val exact = exactF()
    val annIds = ann.values.flatten.toSet
    val exactIds = exact.values.flatten.toSet
    val streamedFound = annIds.exists(_ > maxId / 2) ||
      !exactIds.exists(_ > maxId / 2)
    if (RecallProtocol.meanRecallOk(ann, exact) && streamedFound)
      Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("scalar_quant_i8", Some(oracle), quantI8),
    QueryDef("bq_rescore_recall", Some("SELECT 1 AS ok"), bqRescoreRecall),
    QueryDef("streaming_bq_insert", Some("SELECT 1 AS ok"), streamingBqInsert),
  )
}
