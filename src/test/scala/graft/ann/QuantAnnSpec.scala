package graft.ann

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.l2sq_dist

/** In-graph scalar quantization (`quant_bits` analog): i8/f16 element
  * storage inside HNSW shards — artifact shrinks, traversal runs on
  * quantized distances, exact re-rank recovers full-precision ranking.
  */
class QuantAnnSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64
  private lazy val data = {
    val rnd = new scala.util.Random(7)
    // clustered unit-ish vectors: 20 centers, 50 points each
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextFloat() - 0.5f))
    (0 until 1000).map { i =>
      val c = centers(i % 20)
      val v = c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      (i.toLong, v.toSeq)
    }.toDF("id", "vec").localCheckpoint()
  }

  private def tmp(name: String): String =
    new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-quant").toFile, name).toString

  private def shardBytes(p: String): Long = AnnIndex.graphBytes(spark, p)

  private def exactTop(q: Array[Float], k: Int): Set[Long] =
    data.withColumn("d", l2sq_dist(col("vec"), lit(q)))
      .orderBy(col("d"), col("id")).limit(k)
      .select("id").collect().map(_.getLong(0)).toSet

  test("i8 shards: ~4x smaller artifact, recall holds, rerank recovers") {
    val f32 = tmp("f32"); val i8 = tmp("i8")
    AnnIndex.build(data, "id", "vec", f32, AnnParams(numPartitions = 2))
    AnnIndex.build(data, "id", "vec", i8,
      AnnParams(numPartitions = 2, quant = "i8"))

    // raw vector payload is 4x smaller; neighbor lists + gzip dilute
    // the file ratio — at dim 64 the shard must still at least halve
    assert(shardBytes(i8) * 2 <= shardBytes(f32),
      s"i8=${shardBytes(i8)} f32=${shardBytes(f32)}")

    val q = data.where($"id" === 3).select("vec").head().getSeq[Float](0).toArray
    val exact = exactTop(q, 10)
    val plain = AnnIndex.search(spark, i8, q, 10).map(_._1).toSet
    assert(plain.intersect(exact).size >= 8, s"i8 recall ${plain.intersect(exact).size}/10")
    val rr = AnnIndex.searchRerank(data, "id", "vec", i8, q, 10).map(_._1).toSet
    assert(rr.intersect(exact).size >= 9, s"rerank recall ${rr.intersect(exact).size}/10")
  }

  test("f16 shards: half-size artifact, compact serving, near-exact recall") {
    val f32 = tmp("f32"); val f16 = tmp("f16")
    AnnIndex.build(data, "id", "vec", f32, AnnParams(numPartitions = 2))
    AnnIndex.build(data, "id", "vec", f16,
      AnnParams(numPartitions = 2, quant = "f16"))
    assert(shardBytes(f16) * 4 <= shardBytes(f32) * 3,
      s"f16=${shardBytes(f16)} f32=${shardBytes(f32)}")
    val q = data.where($"id" === 3).select("vec").head().getSeq[Float](0).toArray
    val exact = exactTop(q, 10)
    val got = AnnIndex.search(spark, f16, q, 10).map(_._1).toSet
    assert(got.intersect(exact).size >= 9, s"f16 recall ${got.intersect(exact).size}/10")
    // read-mode f16 graphs serve from half-size codes, bit-identically
    val shard = new java.io.File(s"$f16/graphs").listFiles()
      .filter(_.getName.endsWith(".hnsw")).head
    val g = HnswGraph.read(new java.io.DataInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(shard))))
    assert(g.compact && g.vecs.isEmpty)
    (0 until 50).foreach { n =>
      assert(g.queryDist(q)(n) == Metric.dist(g.metric, q, g.vector(n)), s"node $n")
    }
  }

  test("i8 shards deserialize compact: codes in RAM, bit-identical distances") {
    val i8 = tmp("i8c")
    AnnIndex.build(data, "id", "vec", i8,
      AnnParams(numPartitions = 1, quant = "i8"))
    val shard = new java.io.File(s"$i8/graphs").listFiles()
      .filter(_.getName.endsWith(".hnsw")).head
    val g = HnswGraph.read(new java.io.DataInputStream(
      new java.io.BufferedInputStream(
        new java.io.FileInputStream(shard))))
    assert(g.compact, "read-mode i8 graph must store codes")
    assert(g.vecs.isEmpty, "no f32 arrays in a compact graph")
    intercept[IllegalArgumentException] { g.insert(9999L, new Array[Float](dim)) }
    // asymmetric i8 distance == distance on the dequantized vector,
    // bit for bit — search scores cannot drift from the f32 decode path
    val q = data.where($"id" === 11).select("vec").head().getSeq[Float](0).toArray
    (0 until 50).foreach { n =>
      assert(g.queryDist(q)(n) == Metric.dist(g.metric, q, g.vector(n)), s"node $n")
    }
    // vectors() reconstruction equals the snapped build values
    val rec = AnnIndex.vectors(spark, i8).where(col("id") === 11)
      .select("vec").head().getSeq[Float](0).toArray
    val snapped = graft.pq.ScalarQuantizer.dequantizeI8(
      graft.pq.ScalarQuantizer.quantizeI8(q), -1f, 1f)
    assert(rec.sameElements(snapped))
  }

  test("quantized artifact round-trips: header, shard quant, validate, append") {
    val i8 = tmp("i8rt")
    AnnIndex.build(data.where($"id" < 500), "id", "vec", i8,
      AnnParams(numPartitions = 2, quant = "i8", i8Lo = -0.8f, i8Hi = 0.8f))
    val h = AnnIndex.readHeader(spark, i8)
    assert(h.quant == "i8" && h.i8Lo == -0.8f && h.i8Hi == 0.8f)
    assert(AnnIndex.validate(spark, i8).count() == 0)
    // delta shards inherit the header's quant + range
    AnnIndex.append(data.where($"id" >= 500), "id", "vec", i8)
    val q = data.where($"id" === 900).select("vec").head().getSeq[Float](0).toArray
    val got = AnnIndex.search(spark, i8, q, 5).map(_._1)
    assert(got.contains(900L), s"append rows searchable, got ${got.toSeq}")
    // stored elements are snapped: every value is a representable i8 level
    val vecs = AnnIndex.vectors(spark, i8)
      .where(col("id") === 900).select("vec").head().getSeq[Float](0)
    val snapped = graft.pq.ScalarQuantizer.dequantizeI8(
      graft.pq.ScalarQuantizer.quantizeI8(vecs.toArray, -0.8f, 0.8f), -0.8f, 0.8f)
    assert(vecs.toArray.sameElements(snapped))
  }

  test("hamming metric rejects non-f32 quant") {
    intercept[IllegalArgumentException] {
      new HnswGraph(64, 8, 32, Metric.Hamming, 0L, Quant.I8)
    }
    // and ALREADY at params construction — build() deletes any existing
    // artifact before writing shards, so a combination that only failed
    // executor-side would destroy the old index first
    intercept[IllegalArgumentException] {
      AnnParams(metric = "hamming", quant = "i8")
    }
    intercept[IllegalArgumentException] {
      AnnParams(metric = "hamming", quant = "f16")
    }
    intercept[IllegalArgumentException] { AnnParams(metric = "nope") }
  }
}
