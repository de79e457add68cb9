package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (seeded random sweeps — deterministic) for the
  * pure kernels behind the layout / projection operators. Driver-side
  * models, no Spark session needed. */
class KernelPropertySpec extends AnyFunSuite {

  private def mortonModel(vs: Seq[Long], budgets: Seq[Int]): Long = {
    var pos = 0
    var z = 0L
    for (level <- 0 until budgets.max; i <- budgets.indices if level < budgets(i)) {
      z |= ((vs(i) >> level) & 1L) << pos
      pos += 1
    }
    z
  }

  test("zorderKeyN bit assignment: key fits the budget sum and round-trips") {
    val rnd = new scala.util.Random(21)
    for (_ <- 0 until 300) {
      val n = 2 + rnd.nextInt(4)
      val budgets = Seq.fill(n)(1 + rnd.nextInt(10))
      if (budgets.sum <= 63) {
        val vs = budgets.map(b => math.abs(rnd.nextLong()) % (1L << b))
        val z = mortonModel(vs, budgets)
        assert(z >= 0 && z < (1L << budgets.sum))
        // each column's bits are recoverable from its assigned positions
        var pos = 0
        val rec = Array.fill(n)(0L)
        for (level <- 0 until budgets.max; i <- budgets.indices if level < budgets(i)) {
          rec(i) |= ((z >> pos) & 1L) << level
          pos += 1
        }
        assert(rec.toSeq == vs, s"budgets=$budgets vs=$vs")
      }
    }
  }

  test("normalizeIfCos: idempotent, unit norm (or zero), non-cos passthrough") {
    import graft.ann.Metric
    val rnd = new scala.util.Random(22)
    for (_ <- 0 until 200) {
      val d = 1 + rnd.nextInt(16)
      val v = Array.fill(d)((rnd.nextFloat() * 200 - 100))
      assert(Metric.normalizeIfCos(v, "l2sq") eq v)
      val n1 = Metric.normalizeIfCos(v, "cos")
      val norm = math.sqrt(n1.map(x => x.toDouble * x).sum)
      assert(norm == 0.0 || math.abs(norm - 1.0) < 1e-3)
      val n2 = Metric.normalizeIfCos(n1, "cos")
      assert(n1.zip(n2).forall { case (a, b) => math.abs(a - b) < 1e-6 })
    }
    val zero = Array(0.0f, 0.0f)
    assert(Metric.normalizeIfCos(zero, "cos").toSeq == zero.toSeq)
  }

  test("projectQuery is linear: P(a*q) == a*P(q) when bias is null") {
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 100) {
      val dIn = 1 + rnd.nextInt(8)
      val dOut = 1 + rnd.nextInt(6)
      val m = RandomProjection.gaussian(dIn, dOut, rnd.nextLong())
      val q = Array.fill(dIn)(rnd.nextFloat() * 2 - 1)
      val a = rnd.nextFloat() * 8 - 4
      val pq = ProjectedSearch.projectQuery(m, null, q)
      val paq = ProjectedSearch.projectQuery(m, null, q.map(x => a * x))
      pq.zip(paq).foreach { case (p, pa) =>
        // a*x rounds to float per element before projecting, so allow
        // float-level relative error
        assert(math.abs(pa - a.toDouble * p) < 1e-5 * (1 + math.abs(a * p)),
          s"$pa vs ${a * p}")
      }
    }
  }

  test("jacobiEigen: A == V diag(lambda) V^T on random symmetric matrices") {
    val rnd = new scala.util.Random(24)
    for (_ <- 0 until 50) {
      val d = 2 + rnd.nextInt(7)
      val a = Array.ofDim[Double](d, d)
      for (i <- 0 until d; j <- i until d) {
        val x = rnd.nextGaussian()
        a(i)(j) = x; a(j)(i) = x
      }
      val (vals, vecs) = Pca.jacobiEigen(a)
      for (i <- 0 until d; j <- 0 until d) {
        var s = 0.0
        for (k <- 0 until d) s += vecs(i)(k) * vals(k) * vecs(j)(k)
        assert(math.abs(s - a(i)(j)) < 1e-8, s"($i,$j): $s vs ${a(i)(j)}")
      }
    }
  }
}
