package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.GraftSqlShim

/** Random-projection dimensionality reduction for embedding columns —
  * the Johnson–Lindenstrauss scale lever: project `dimIn` floats onto
  * `dimOut` seeded random directions so downstream ANN/dedup/cluster
  * passes pay `dimOut/dimIn` of the distance arithmetic, shuffle bytes
  * and index size, with pairwise distances preserved to (1 ± ε)
  * (JL lemma). The projection is a per-row map — no shuffle, no fit
  * pass, no stored model beyond (seed, dims): a 100 TB corpus
  * re-derives the same matrix anywhere from the seed.
  *
  * Two standard matrices:
  *  - [[gaussian]]: N(0, 1/dimOut) entries (the classic JL form);
  *  - [[sparse]]: Achlioptas' database-friendly ±sqrt(3/dimOut) with
  *    probability 1/6 each, 0 with 2/3 ("Database-friendly random
  *    projections", PODS'01) — two thirds of the multiplies vanish.
  *
  * Both are deterministic in (seed, dims) via a fixed-algorithm
  * generator (java.util.Random), and the projection itself is the
  * codegen'd [[graft.functions.MatVecProject]] kernel with sequential
  * per-coordinate sums a SQL oracle replays exactly.
  */
object RandomProjection {

  /** Dense Gaussian JL matrix: entries N(0, 1) / sqrt(dimOut). */
  def gaussian(dimIn: Int, dimOut: Int, seed: Long): Array[Array[Double]] = {
    require(dimIn > 0 && dimOut > 0, "graft: projection dims must be positive")
    val rnd = new java.util.Random(seed)
    val inv = 1.0 / math.sqrt(dimOut.toDouble)
    Array.fill(dimOut, dimIn)(rnd.nextGaussian() * inv)
  }

  /** Achlioptas sparse matrix: sqrt(3/dimOut) · {+1 w.p. 1/6, 0 w.p.
    * 2/3, −1 w.p. 1/6}. */
  def sparse(dimIn: Int, dimOut: Int, seed: Long): Array[Array[Double]] = {
    require(dimIn > 0 && dimOut > 0, "graft: projection dims must be positive")
    val rnd = new java.util.Random(seed)
    val s = math.sqrt(3.0 / dimOut)
    Array.fill(dimOut, dimIn) {
      val u = rnd.nextInt(6)
      if (u == 0) s else if (u == 1) -s else 0.0
    }
  }

  /** Project an `array<float>` column through `matrix` (dimOut rows ×
    * dimIn columns) to `array<double>` — one codegen'd kernel, no UDF. */
  def project(vec: Column, matrix: Array[Array[Double]]): Column =
    GraftSqlShim.column(graft.functions.MatVecProject(
      GraftSqlShim.expression(vec), matrix))
}
