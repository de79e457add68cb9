package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RandomProjectionSpec extends SparkTestBase {
  import spark.implicits._

  test("project == manual mat-vec; deterministic in seed; codegen (no UDF)") {
    val m = RandomProjection.gaussian(4, 3, seed = 11L)
    assert(RandomProjection.gaussian(4, 3, seed = 11L).flatten.toSeq ==
      m.flatten.toSeq)
    assert(RandomProjection.gaussian(4, 3, seed = 12L).flatten.toSeq !=
      m.flatten.toSeq)
    val v = Array(1.0f, -2.0f, 0.5f, 3.0f)
    val df = Seq(Tuple1(v)).toDF("v")
      .select(RandomProjection.project(col("v"), m).as("p"))
    val got = df.head().getSeq[Double](0)
    val want = m.map(row => row.zip(v).map { case (a, b) => a * b.toDouble }.sum)
    assert(got.zip(want).forall { case (g, w) => math.abs(g - w) < 1e-12 })
    // codegen over a real (non-foldable) scan: the projection must ride
    // whole-stage codegen with no ScalaUDF
    val m64 = RandomProjection.gaussian(64, 8, seed = 11L)
    val scan = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select(RandomProjection.project(col("embedding"), m64).as("p"))
    val udfs = scan.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
    })
    assert(udfs.isEmpty)
    assert(graft.ops.MaskedExplain.explain(scan, "formatted").contains("* Project"))
  }

  test("sparse matrix: entries in {±sqrt(3/k), 0} at roughly 1/6-2/3-1/6") {
    val k = 16
    val m = RandomProjection.sparse(256, k, seed = 3L)
    val s = math.sqrt(3.0 / k)
    val flat = m.flatten
    assert(flat.forall(x => x == 0.0 || math.abs(math.abs(x) - s) < 1e-15))
    val zeroFrac = flat.count(_ == 0.0).toDouble / flat.length
    assert(zeroFrac > 0.55 && zeroFrac < 0.78, s"zeroFrac=$zeroFrac")
  }

  test("JL property: pairwise squared distances preserved within loose bounds") {
    val rnd = new scala.util.Random(5)
    val dimIn = 64; val dimOut = 32
    val vecs = Array.fill(40)(Array.fill(dimIn)(rnd.nextGaussian().toFloat))
    val m = RandomProjection.gaussian(dimIn, dimOut, seed = 9L)
    def proj(v: Array[Float]): Array[Double] =
      m.map(row => row.zip(v).map { case (a, b) => a * b.toDouble }.sum)
    val ps = vecs.map(proj)
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    def p2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- vecs.indices; j <- vecs.indices if i < j
    } yield p2(ps(i), ps(j)) / d2(vecs(i), vecs(j))
    // dimOut=32 gives ε ≈ sqrt(8·ln(n)/k) ≈ 0.96 worst-case; actual
    // concentration on seeded Gaussian data is far tighter
    assert(ratios.forall(r => r > 0.3 && r < 2.2),
      s"worst ratios: ${ratios.min}, ${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean ratio $mean")
  }

  test("dimension mismatch raises") {
    val m = RandomProjection.gaussian(4, 2, seed = 1L)
    val e = intercept[Exception] {
      Seq(Tuple1(Array(1.0f, 2.0f))).toDF("v")
        .select(RandomProjection.project(col("v"), m)).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("dimension")), e.toString)
  }
}
