package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.GraftSqlShim

/** PCA / whitening for embedding columns — the learned counterpart of
  * [[RandomProjection]]: project onto the top-k covariance
  * eigendirections (optionally scaled to unit variance), the standard
  * preprocessing before SemDeDup-style clustering and cosine retrieval
  * when raw embedding dimensions are correlated.
  *
  * Scale shape: the FIT is one pass — each partition accumulates
  * (n, Σv, upper-triangular Σvvᵀ), ~d²/2 doubles of state (16 KB at
  * d=64, 2 MB at d=512), merged on the driver in PARTITION-INDEX order
  * so the double sums are deterministic under re-runs. The d×d
  * eigenproblem runs driver-side (cyclic Jacobi — d is the embedding
  * width, never the corpus). The PROJECTION is the codegen'd
  * [[graft.functions.MatVecProject]] kernel with fused mean-bias and
  * whitening scale — per-row map, no shuffle, and arithmetic a SQL
  * oracle replays term-for-term (`Σ W·v − W·μ` rather than
  * `Σ W·(v−μ)`: same math, different float rounding — the emitted
  * form is the contract).
  */
object Pca {

  /** Fitted model: `mean` (d), `components` (k × d rows = top
    * eigenvectors, eigenvalue-descending, sign-normalized so each
    * row's largest-|coordinate| is positive), `eigenvalues` (k). */
  case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      eps: Double = 1e-9) {
    /** Per-output-row constant `W·μ` — the fused projection bias. */
    def bias: Array[Double] =
      components.map { row =>
        var s = 0.0; var j = 0
        while (j < row.length) { s += row(j) * mean(j); j += 1 }
        s
      }
    /** Whitening scales `1/√(λ+eps)`. */
    def whitenScale: Array[Double] =
      eigenvalues.map(l => 1.0 / math.sqrt(math.max(l, 0.0) + eps))
  }

  /** Merge-tree fan-in for the co-moment reduction: each merge task
    * holds at most this many d(d+1)/2 triangles (~128 MB at the
    * reference's max dim 2000, options.h:15), and so does the driver's
    * final fold. With P ≤ fan-in partitions no tree level runs and the
    * arithmetic is the original sorted sequential fold. */
  private[ops] val MergeFanIn = 8

  /** One-pass covariance fit + driver-side eigendecomposition.
    * `sampleLimit > 0` fits on a deterministic hash-sample of ~that
    * many rows instead of the full column — at 100 TB the covariance
    * stabilizes long before the corpus is exhausted, and the sample
    * bound makes fit cost independent of corpus size (the same knob
    * [[graft.ann.IvfIndex.build]] exposes for its k-means). */
  def fit(df: DataFrame, vecCol: String, dimOut: Int,
      sampleLimit: Int = 0): PcaModel = {
    val src =
      if (sampleLimit > 0)
        graft.util.Sampling.hashSample(df.select(col(vecCol)), sampleLimit, col(vecCol))
      else df
    val partials = src.select(col(vecCol)).na.drop().rdd
      .mapPartitionsWithIndex { (idx, it) =>
        var n = 0L
        var sum: Array[Double] = null
        var co: Array[Double] = null // upper triangle, row-major
        it.foreach { r =>
          val v = r.getSeq[Float](0)
          val d = v.length
          if (sum == null) { sum = new Array[Double](d); co = new Array[Double](d * (d + 1) / 2) }
          require(v.length == sum.length, "graft: pca fit saw ragged vectors")
          n += 1
          var i = 0; var t = 0
          while (i < d) {
            val vi = v(i).toDouble
            sum(i) += vi
            var j = i
            while (j < d) { co(t) += vi * v(j); j += 1; t += 1 }
            i += 1
          }
        }
        if (n == 0) Iterator.empty else Iterator.single((idx, (n, sum, co)))
      }
    // deterministic TREE merge of the co-moment partials: at P
    // partitions a flat collect would hold P × d(d+1)/2 doubles on the
    // driver (~4 GB at d=2000, P=256); instead each level groups
    // MergeFanIn consecutive partition indexes onto one task, merges
    // them in SORTED index order (fixed grouping + fixed in-group
    // order + left-associative fold ⇒ bit-identical doubles on every
    // run over the same partitioning), and the driver only ever
    // collects the final ≤ MergeFanIn partials — O(d²) residency
    // regardless of P.
    def merge(a: (Long, Array[Double], Array[Double]),
        b: (Long, Array[Double], Array[Double])): (Long, Array[Double], Array[Double]) = {
      val (na, sa, ca) = a
      val (nb, sb, cb) = b
      // partitions that are each internally consistent but disagree
      // with each other would otherwise merge co-moment triangles of
      // different layouts
      require(sa.length == sb.length,
        s"graft: pca fit saw ragged vectors across partitions " +
          s"(dims ${sa.length} vs ${sb.length})")
      val s = new Array[Double](sa.length)
      val c = new Array[Double](ca.length)
      var i = 0
      while (i < s.length) { s(i) = sa(i) + sb(i); i += 1 }
      i = 0
      while (i < c.length) { c(i) = ca(i) + cb(i); i += 1 }
      (na + nb, s, c)
    }
    var cur = partials
    var span = math.max(cur.getNumPartitions, 1)
    while (span > MergeFanIn) {
      val groups = math.max((span + MergeFanIn - 1) / MergeFanIn, 1)
      cur = cur
        .map { case (i, p) => (i / MergeFanIn, (i, p)) }
        .groupByKey(groups)
        .map { case (g, it) =>
          (g, it.toArray.sortBy(_._1).map(_._2).reduce(merge))
        }
      span = groups
    }
    val parts = cur.collect().sortBy(_._1).map(_._2)
    require(parts.nonEmpty, "graft: pca fit on an empty column")
    val d = parts.head._2.length
    require(parts.forall(_._2.length == d),
      s"graft: pca fit saw ragged vectors across partitions " +
        s"(dims ${parts.map(_._2.length).distinct.mkString(", ")})")
    require(dimOut >= 1 && dimOut <= d,
      s"graft: pca dimOut must be in [1, $d], got $dimOut")
    val (n, sum, co) = parts.reduce(merge)
    val mean = sum.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0; var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = co(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(k => (-values(k), k)).take(dimOut)
    val components = order.map { k =>
      val row = Array.tabulate(d)(j => vectors(j)(k))
      // sign convention: largest-|coordinate| positive — deterministic
      // across Jacobi rotation orders
      val argmax = row.indices.maxBy(j => (math.abs(row(j)), -j))
      if (row(argmax) < 0) row.map(-_) else row
    }.toArray
    PcaModel(mean, components, order.map(values).toArray)
  }

  /** Project an `array<float>` column to `array<double>` scores
    * (`W·v − W·μ`, times `1/√(λ+eps)` when whitening) — one codegen'd
    * kernel. */
  def project(vec: Column, model: PcaModel, whiten: Boolean = false): Column =
    GraftSqlShim.column(graft.functions.MatVecProject(
      GraftSqlShim.expression(vec), model.components, model.bias,
      if (whiten) model.whitenScale else null))

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * `(eigenvalues, eigenvectors-as-columns)` (Golub & Van Loan §8.5).
    * O(d³) per sweep on the driver — d is the vector width. */
  private[ops] def jacobiEigen(
      m: Array[Array[Double]],
      maxSweeps: Int = 64,
      tol: Double = 1e-13): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += 2 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(s)
    }
    val scale = math.max(1.0, m.indices.map(i => math.abs(m(i)(i))).max)
    var sweep = 0
    while (sweep < maxSweeps && offNorm() > tol * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol * scale / (d * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
            val sgnT = if (theta >= 0) 1.0 else -1.0
            val tn = sgnT / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(tn * tn + 1)
            val s = tn * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
