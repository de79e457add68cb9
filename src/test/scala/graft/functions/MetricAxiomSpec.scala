package graft.functions

import graft.SparkTestBase
import graft.ann.Metric
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Metric axioms over seeded random vectors (SURVEY.md §5 property
  * tests): identity, symmetry, range bounds, estimator accuracy —
  * checked through both the Scala kernels and the Catalyst
  * expressions (which must agree bit-for-bit).
  */
class MetricAxiomSpec extends SparkTestBase {

  private val rng = new java.util.Random(1234)
  private def vec(dim: Int): Array[Float] =
    Array.fill(dim)(rng.nextFloat() * 4 - 2)

  test("l2sq/cos/inner: identity, symmetry, bounds (200 random pairs)") {
    (1 to 200).foreach { _ =>
      val a = vec(16); val b = vec(16)
      // identity
      assert(Metric.dist(Metric.L2Sq, a, a) === 0.0)
      assert(Metric.dist(Metric.Cos, a, a) < 1e-12)
      // symmetry
      assert(Metric.dist(Metric.L2Sq, a, b) === Metric.dist(Metric.L2Sq, b, a))
      assert(Metric.dist(Metric.Cos, a, b) === Metric.dist(Metric.Cos, b, a))
      // bounds
      assert(Metric.dist(Metric.L2Sq, a, b) >= 0.0)
      val cd = Metric.dist(Metric.Cos, a, b)
      assert(cd >= -1e-12 && cd <= 2.0 + 1e-12)
    }
  }

  test("catalyst expressions agree with the scala kernels bit-for-bit") {
    import spark.implicits._
    val pairs = (1 to 50).map(_ => (vec(8), vec(8)))
    val df = pairs.toDF("a", "b")
      .select(
        l2sq_dist($"a", $"b").as("l2"),
        cos_dist($"a", $"b").as("co"),
        inner_product($"a", $"b").as("ip"))
      .collect()
    pairs.zip(df).foreach { case ((a, b), row) =>
      assert(row.getDouble(0) === Metric.dist(Metric.L2Sq, a, b))
      assert(row.getDouble(1) === Metric.dist(Metric.Cos, a, b))
      assert(row.getDouble(2) === -Metric.dist(Metric.Inner, a, b))
    }
  }

  test("zero vector: cos_dist defined as 1.0, norm 0") {
    import spark.implicits._
    val z = Array.fill(4)(0f)
    val df = Seq((z, Array(1f, 2f, 3f, 4f))).toDF("a", "b")
    assert(df.select(cos_dist($"a", $"b")).head().getDouble(0) === 1.0)
    assert(df.select(vector_norm($"a")).head().getDouble(0) === 0.0)
  }

  test("minhash signature similarity is an unbiased-ish jaccard estimator") {
    import spark.implicits._
    // two sets with known jaccard 50/150 = 1/3
    val a = (0 until 100).map(i => s"tok$i")
    val b = (50 until 200).map(i => s"tok$i")
    val df = Seq((1L, a), (2L, b)).toDF("id", "toks")
      .select(Dedup.minhashSignature(col("toks"), 256).as("sig"))
      .collect()
    val sa = df(0).getSeq[Long](0); val sb = df(1).getSeq[Long](0)
    val est = sa.zip(sb).count { case (x, y) => x == y } / 256.0
    val trueJ = 50.0 / 200.0 // |∩|=50, |∪|=200
    assert(math.abs(est - trueJ) < 0.12, s"est $est vs $trueJ")
  }

  test("hamming: symmetry and triangle inequality (true metric)") {
    val x = Array.fill(4)(rng.nextInt())
    val y = Array.fill(4)(rng.nextInt())
    val z = Array.fill(4)(rng.nextInt())
    def h(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map { case (i, j) => Integer.bitCount(i ^ j) }.sum
    assert(h(x, y) === h(y, x))
    assert(h(x, x) === 0)
    assert(h(x, z) <= h(x, y) + h(y, z))
  }
}
