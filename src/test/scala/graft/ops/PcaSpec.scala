package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  test("jacobiEigen matches the analytic 2x2 decomposition") {
    // [[3,1],[1,3]] has eigenvalues 4 (along (1,1)/√2) and 2
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(3.0, 1.0), Array(1.0, 3.0)))
    val order = vals.indices.sortBy(-vals(_))
    assert(math.abs(vals(order(0)) - 4.0) < 1e-12)
    assert(math.abs(vals(order(1)) - 2.0) < 1e-12)
    val v0 = Array(vecs(0)(order(0)), vecs(1)(order(0)))
    assert(math.abs(math.abs(v0(0)) - 1 / math.sqrt(2)) < 1e-12)
    assert(math.abs(v0(0) - v0(1)) < 1e-12) // same sign, equal parts
  }

  private def fitData(n: Int): Seq[(Long, Array[Float])] = {
    // anisotropic Gaussian: dominant direction (1,1,0)/√2 with sd 3,
    // second (0,0,1) with sd 1, third (1,-1,0)/√2 with sd 0.1
    val rnd = new scala.util.Random(13)
    (0 until n).map { i =>
      val a = rnd.nextGaussian() * 3
      val b = rnd.nextGaussian() * 1
      val c = rnd.nextGaussian() * 0.1
      (i.toLong, Array(
        (5 + (a + c) / math.sqrt(2)).toFloat,
        (5 + (a - c) / math.sqrt(2)).toFloat,
        (2 + b).toFloat))
    }
  }

  test("fit recovers mean, orthonormal descending components; whitening unit-variance") {
    val df = fitData(2000).toDF("id", "v")
    val m = Pca.fit(df, "v", 3)
    assert(math.abs(m.mean(0) - 5) < 0.2 && math.abs(m.mean(2) - 2) < 0.2)
    // eigenvalues descending ≈ (9, 1, 0.01)
    assert(m.eigenvalues(0) > m.eigenvalues(1) && m.eigenvalues(1) > m.eigenvalues(2))
    assert(math.abs(m.eigenvalues(0) - 9) < 1.0)
    assert(math.abs(m.eigenvalues(1) - 1) < 0.2)
    // top component ≈ (1,1,0)/√2, sign-normalized positive
    val c0 = m.components(0)
    assert(math.abs(math.abs(c0(0)) - 1 / math.sqrt(2)) < 0.05, c0.toSeq.toString)
    assert(c0(0) > 0 && math.abs(c0(0) - c0(1)) < 0.05 && math.abs(c0(2)) < 0.1)
    // orthonormal rows
    for (i <- 0 until 3; j <- i until 3) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j)=$dot")
    }
    // determinism: a second fit is bit-identical
    val m2 = Pca.fit(df, "v", 3)
    assert(m2.components.flatten.toSeq == m.components.flatten.toSeq)
    assert(m2.eigenvalues.toSeq == m.eigenvalues.toSeq)
    // projected variances ≈ eigenvalues; whitened variances ≈ 1
    val proj = df.select(Pca.project(col("v"), m).as("p"),
        Pca.project(col("v"), m, whiten = true).as("w"))
      .collect().map(r => (r.getSeq[Double](0), r.getSeq[Double](1)))
    for (j <- 0 until 3) {
      val xs = proj.map(_._1(j))
      val mu = xs.sum / xs.length
      val va = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      assert(math.abs(va - m.eigenvalues(j)) < 0.05 * math.max(1.0, m.eigenvalues(j)),
        s"dim $j: var $va vs λ ${m.eigenvalues(j)}")
      val ws = proj.map(_._2(j))
      val wmu = ws.sum / ws.length
      val wva = ws.map(x => (x - wmu) * (x - wmu)).sum / ws.length
      assert(math.abs(wva - 1.0) < 0.05, s"whitened dim $j var $wva")
    }
  }

  test("sampleLimit fit: deterministic, approximates the full-column fit") {
    val df = fitData(2000).toDF("id", "v")
    val full = Pca.fit(df, "v", 3)
    val sampled = Pca.fit(df, "v", 3, sampleLimit = 600)
    val again = Pca.fit(df, "v", 3, sampleLimit = 600)
    assert(sampled.components.flatten.toSeq == again.components.flatten.toSeq)
    // dominant direction agrees with the full fit (sign-normalized)
    val dot = sampled.components(0).zip(full.components(0))
      .map { case (a, b) => a * b }.sum
    assert(math.abs(dot) > 0.95, s"top-component dot $dot")
    assert(sampled.eigenvalues(0) > sampled.eigenvalues(1))
  }

  test("tree-merged many-partition fit: deterministic, matches the sequential fit") {
    val df = fitData(2000).toDF("id", "v")
    // 37 partitions > MergeFanIn ⇒ the tree levels actually run; the
    // driver never holds more than MergeFanIn co-moment triangles
    val wide = df.repartition(37, col("id"))
    val tree = Pca.fit(wide, "v", 3)
    val again = Pca.fit(wide, "v", 3)
    // determinism: fixed grouping + sorted in-group order + left fold
    assert(tree.components.flatten.toSeq == again.components.flatten.toSeq)
    assert(tree.eigenvalues.toSeq == again.eigenvalues.toSeq)
    assert(tree.mean.toSeq == again.mean.toSeq)
    // model equality with the narrow (≤ fan-in, sequential-fold) path:
    // association differs so doubles can differ in the last ulps, but
    // the MODEL must agree far beyond estimation noise
    val seq = Pca.fit(df.coalesce(2), "v", 3)
    tree.mean.zip(seq.mean).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"mean $a vs $b") }
    tree.eigenvalues.zip(seq.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"eigenvalue $a vs $b") }
    tree.components.flatten.toSeq.zip(seq.components.flatten.toSeq)
      .foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6, s"component $a vs $b") }
  }

  test("projection is codegen'd (no ScalaUDF) over a real scan") {
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
    val m = Pca.fit(e, "embedding", 4)
    val df = e.select(Pca.project(col("embedding"), m, whiten = true).as("p"))
    val udfs = df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
    })
    assert(udfs.isEmpty)
    assert(graft.ops.MaskedExplain.explain(df, "formatted").contains("* Project"))
    // kernel parity: first row by hand
    val v = e.orderBy("vec_id").select("embedding").head().getSeq[Float](0).toArray
    val got = e.orderBy("vec_id")
      .select(Pca.project(col("embedding"), m, whiten = true)).head().getSeq[Double](0)
    val want = m.components.indices.map { r =>
      val s = m.components(r).zip(v).map { case (a, b) => a * b.toDouble }.sum
      (s - m.bias(r)) * m.whitenScale(r)
    }
    assert(got.zip(want).forall { case (g, w) => math.abs(g - w) < 1e-9 })
  }
}
