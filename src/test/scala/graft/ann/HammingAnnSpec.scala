package graft.ann

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.hamming_dist
import graft.pq.ScalarQuantizer
import graft.plans.AnnCatalog

/** Hamming-metric ANN over b1-packed bit vectors — the
  * `dist_hamming_ops` opclass analog (lantern_hnsw/sql/lantern.sql:
  * 88-99; b1 handling hnsw.c:308-319).
  */
class HammingAnnSpec extends SparkTestBase {
  import spark.implicits._

  // 200 random 64-bit signatures as b1-packed array<int> (2 ints each)
  private lazy val bits = {
    val rnd = new java.util.Random(3)
    (0L until 200L).map { i =>
      (i, Seq(rnd.nextInt(), rnd.nextInt()))
    }.toDF("id", "bits")
  }

  private def exactTop(q: Array[Int], k: Int): Seq[(Long, Int)] =
    bits.withColumn("hd", hamming_dist($"bits", lit(q)))
      .orderBy($"hd", $"id").limit(k)
      .select($"id", $"hd").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq

  test("hamming index: ANN distances match the exact top-k distance multiset") {
    val path = Files.createTempDirectory("graft-hamming").toString + "/idx"
    AnnIndex.build(bits, "id", "bits", path,
      AnnParams(m = 16, efConstruction = 200, ef = 200,
        metric = "hamming", numPartitions = 1))
    assert(AnnIndex.readHeader(spark, path).metric == "hamming")
    (0 until 5).foreach { qi =>
      val q = bits.where($"id" === qi).select("bits").head().getSeq[Int](0).toArray
      val ann = AnnIndex.searchHamming(spark, path, q, 10, efOverride = 200)
      val exact = exactTop(q, 10)
      assert(ann.map(_._2.toInt).toSeq == exact.map(_._2),
        s"query $qi distances must match")
      assert(ann.head._2 == 0.0 && ann.head._1 == qi,
        "query vector itself is its own nearest neighbor")
    }
  }

  test("append to a hamming index converts b1 ints like build does") {
    val path = Files.createTempDirectory("graft-hamming-app").toString + "/idx"
    val (first, rest) = (bits.where($"id" < 150), bits.where($"id" >= 150))
    AnnIndex.build(first, "id", "bits", path,
      AnnParams(metric = "hamming", ef = 200, numPartitions = 1))
    AnnIndex.append(rest, "id", "bits", path)
    val q = bits.where($"id" === 170).select("bits").head().getSeq[Int](0).toArray
    val ann = AnnIndex.searchHamming(spark, path, q, 5, efOverride = 200)
    assert(ann.head._1 == 170L && ann.head._2 == 0.0,
      "appended rows must be searchable")
  }

  test("planner rewrites a hamming_dist sort over a registered b1 table (join-back only)") {
    val tmp = Files.createTempDirectory("graft-hamming-plan").toString
    val table = s"$tmp/bits.parquet"
    bits.write.parquet(table)
    val stored = spark.read.parquet(table)
    AnnIndex.build(stored, "id", "bits", s"$tmp/idx",
      AnnParams(metric = "hamming", ef = 200, numPartitions = 1))
    AnnCatalog.register(spark, table,
      AnnCatalog.IndexMeta(s"$tmp/idx", "id", "bits", "hamming", ef = 200))
    try {
      val q = bits.where($"id" === 7).select("bits").head().getSeq[Int](0).toArray
      def knn = stored.select($"id", $"bits")
        .orderBy(hamming_dist($"bits", lit(q))).limit(10)
      val scans = knn.queryExecution.optimizedPlan.collect {
        case a: graft.plans.AnnScanLogical => a
      }
      assert(scans.size == 1, "hamming sort must trigger the ANN rewrite")
      // the graph stores word floats, never the table's array<int> —
      // results must come through the join-back with TRUE stored bits
      val rows = knn.collect()
      val truth = bits.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      rows.foreach { r =>
        assert(r.getSeq[Int](1) == truth(r.getLong(0)),
          "bits column must be the stored b1 value")
      }
      val got = rows.map { r =>
        var s = 0
        val b = r.getSeq[Int](1)
        q.indices.foreach(i => s += Integer.bitCount(b(i) ^ q(i)))
        s
      }.toSeq
      assert(got == exactTop(q, 10).map(_._2), "re-ranked distances exact")
    } finally AnnCatalog.unregister(spark, table)
  }

  test("b1ToWords round-trips bit counts exactly") {
    val rnd = new java.util.Random(9)
    (0 until 50).foreach { _ =>
      val a = Array.fill(4)(rnd.nextInt())
      val b = Array.fill(4)(rnd.nextInt())
      val expected = a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      val d = Metric.dist(Metric.Hamming, Metric.b1ToWords(a), Metric.b1ToWords(b))
      assert(d == expected.toDouble)
    }
  }
}
