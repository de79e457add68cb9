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

  test("packed codes quantize/dequantize: golden values, MSB-first layout") {
    import graft.pq.ScalarQuantizer._
    // nbits=2 over [-1,1]: levels {-1, -1/3, 1/3, 1} → codes {0,1,2,3}
    val v = Array(-1f, -0.4f, 0.4f, 1f, 0f)
    val p2 = quantizePacked(v, 2)
    assert(p2.length == 2) // 5 elems at 4-per-byte
    assert((0 until 5).map(packedCode(p2, _, 2)) == Seq(0, 1, 2, 3, 2))
    // 0f is equidistant between codes 1 and 2: floor(x+0.5) ties up
    val d2 = dequantizePacked(p2, 5, 2)
    assert(d2(0) == -1f && d2(3) == 1f)
    assert(math.abs(d2(1) - (-1f / 3)) < 1e-6)
    // nbits=1: two levels {lo, hi}
    val p1 = quantizePacked(Array(-0.9f, 0.9f, -0.1f), 1)
    assert((0 until 3).map(packedCode(p1, _, 1)) == Seq(0, 1, 0))
    assert(dequantizePacked(p1, 3, 1).toSeq == Seq(-1f, 1f, -1f))
    // nbits=4: 16 levels; snap-then-encode round-trips bit-exact
    val rnd = new scala.util.Random(3)
    val big = Array.fill(37)(rnd.nextFloat() * 2 - 1)
    val p4 = quantizePacked(big, 4)
    assert(p4.length == 19) // ceil(37/2)
    val snapped = dequantizePacked(p4, 37, 4)
    assert(quantizePacked(snapped, 4).toSeq == p4.toSeq)
    // clamping at both ends
    assert(packedCode(quantizePacked(Array(5f), 4), 0, 4) == 15)
    assert(packedCode(quantizePacked(Array(-5f), 4), 0, 4) == 0)
  }

  test("b4/b2 shards: 8x/16x payload shrink, compact bit-identical serving, rerank recovers") {
    val f32 = tmp("f32p"); val b4 = tmp("b4"); val b2 = tmp("b2")
    AnnIndex.build(data, "id", "vec", f32, AnnParams(numPartitions = 2))
    // quant range sized to the data (values live in ±0.55): at 16
    // levels, wasting half the range on empty space costs real recall
    AnnIndex.build(data, "id", "vec", b4,
      AnnParams(numPartitions = 2, quant = "b4", i8Lo = -0.6f, i8Hi = 0.6f))
    AnnIndex.build(data, "id", "vec", b2,
      AnnParams(numPartitions = 2, quant = "b2", i8Lo = -0.6f, i8Hi = 0.6f))
    // payload shrinks 8x (b4), but at dim 64 the neighbor lists (~150
    // B/vec, identical across kinds) dominate the file — the whole
    // shard still at least halves vs f32
    assert(shardBytes(b4) * 2 <= shardBytes(f32),
      s"b4=${shardBytes(b4)} f32=${shardBytes(f32)}")
    assert(shardBytes(b2) < shardBytes(b4),
      s"b2=${shardBytes(b2)} b4=${shardBytes(b4)}")

    val q = data.where($"id" === 3).select("vec").head().getSeq[Float](0).toArray
    val exact = exactTop(q, 10)
    // at 16 levels the quant step (~0.08) matches the within-cluster
    // noise, so plain traversal finds the right REGION but cannot
    // resolve the top-10 ordering inside a 50-point cluster — that is
    // exactly what the exact rerank is for (asserted ≥ 9 below)
    val plain4 = AnnIndex.search(spark, b4, q, 10).map(_._1).toSet
    assert(plain4.intersect(exact).size >= 5,
      s"b4 recall ${plain4.intersect(exact).size}/10")
    val rr4 = AnnIndex.searchRerank(data, "id", "vec", b4, q, 10).map(_._1).toSet
    assert(rr4.intersect(exact).size >= 9,
      s"b4 rerank recall ${rr4.intersect(exact).size}/10")
    val rr2 = AnnIndex.searchRerank(data, "id", "vec", b2, q, 10,
      efOverride = 100).map(_._1).toSet
    assert(rr2.intersect(exact).size >= 7,
      s"b2 rerank recall ${rr2.intersect(exact).size}/10")

    // compact read-mode: packed codes in RAM, asymmetric distance
    // bit-identical to the decode path; header round-trips the kind
    assert(AnnIndex.readHeader(spark, b4).quant == "b4")
    assert(AnnIndex.validate(spark, b4).count() == 0)
    val shard = new java.io.File(s"$b4/graphs").listFiles()
      .filter(_.getName.endsWith(".hnsw")).head
    val g = HnswGraph.read(new java.io.DataInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(shard))))
    assert(g.compact && g.vecs.isEmpty)
    (0 until 50).foreach { n =>
      assert(g.queryDist(q)(n) == Metric.dist(g.metric, q, g.vector(n)), s"node $n")
    }
    // stored values are snapped to the 16 levels
    val rec = AnnIndex.vectors(spark, b4).where(col("id") === 3)
      .select("vec").head().getSeq[Float](0).toArray
    val snapped = graft.pq.ScalarQuantizer.dequantizePacked(
      graft.pq.ScalarQuantizer.quantizePacked(q, 4, -0.6f, 0.6f), dim, 4,
      -0.6f, 0.6f)
    assert(rec.sameElements(snapped))
  }

  test("b1 level storage: 32x payload shrink, append inherits, distinct from hamming") {
    val b1 = tmp("b1"); val f32 = tmp("f32b1")
    AnnIndex.build(data.where($"id" < 500), "id", "vec", b1,
      AnnParams(numPartitions = 1, quant = "b1"))
    AnnIndex.build(data.where($"id" < 500), "id", "vec", f32,
      AnnParams(numPartitions = 1))
    // 32x payload shrink; neighbor lists cap the file-level ratio
    assert(shardBytes(b1) * 2 <= shardBytes(f32),
      s"b1=${shardBytes(b1)} f32=${shardBytes(f32)}")
    // delta shards inherit quant=b1 from the header
    AnnIndex.append(data.where($"id" >= 500), "id", "vec", b1)
    // every reconstructed element is one of the two levels
    val rec = AnnIndex.vectors(spark, b1).where(col("id") === 700)
      .select("vec").head().getSeq[Float](0)
    assert(rec.forall(x => x == -1f || x == 1f), rec.take(8).toString)
    // the exact rerank still finds the query row itself
    val q = data.where($"id" === 700).select("vec").head().getSeq[Float](0).toArray
    val rr = AnnIndex.searchRerank(data, "id", "vec", b1, q, 10,
      efOverride = 200).map(_._1)
    assert(rr.contains(700L), rr.toSeq.toString)
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
    intercept[IllegalArgumentException] {
      AnnParams(metric = "hamming", quant = "b4")
    }
    intercept[IllegalArgumentException] { AnnParams(metric = "nope") }
    intercept[IllegalArgumentException] { AnnParams(quant = "b3") }
  }
}
