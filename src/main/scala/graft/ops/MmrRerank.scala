package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{inner_product, vector_norm}

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein,
  * SIGIR'98) — diversity-aware top-k: greedily pick the candidate
  * maximizing `λ·sim(q,d) − (1−λ)·max_{s∈picked} sim(d,s)`, so near
  * duplicates of an already-picked result are pushed down. The "give
  * me k DIFFERENT relevant results" composite-search pattern.
  *
  * Scale shape: the corpus-sized work is a plain exact top-`fetchN`
  * (TakeOrderedAndProject — per-partition heaps, k·P merge, no
  * shuffle); the greedy phase is inherently sequential and runs on the
  * driver over `fetchN` rows — bounded by the PARAMETER, not the
  * corpus, exactly like the ANN k·P merge. For very large fetchN run
  * the candidate stage through an ANN index first.
  *
  * Determinism: similarity is the same double arithmetic as the
  * codegen'd vector expressions (`dot/(‖a‖·‖b‖)`), every argmax
  * tie-breaks by id — the whole selection is SQL-replayable.
  */
object MmrRerank {

  /** Cosine similarity with the same accumulation order as the
    * SQL-expression path (dot and norms in one left-to-right pass). */
  private def cosSim(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length,
      s"graft: vector dim mismatch ${a.length} vs ${b.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Re-rank the `fetchN` most query-similar rows of `df` down to the
    * `k` MMR winners. Returns (rank, id, rel) with rank 1..k in pick
    * order and rel = cosine similarity to the query (rounded to 4).
    */
  def rerank(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      lambda: Double,
      fetchN: Int): DataFrame = {
    require(k > 0 && fetchN >= k,
      s"graft: need fetchN >= k > 0, got k=$k fetchN=$fetchN")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"graft: lambda must be in [0,1], got $lambda")
    val spark = df.sparkSession
    val q = lit(query)
    // corpus pass: exact top-fetchN by cosine SIMILARITY (computed as
    // dot/(norm·norm) so the driver greedy below reuses identical
    // doubles), ties by id
    val cands = df
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("v"))
      .withColumn("rel",
        inner_product(col("v"), q) / (vector_norm(col("v")) * vector_norm(q)))
      .orderBy(col("rel").desc, col("id"))
      .limit(fetchN)
      .collect()
    val ids = cands.map(_.getLong(0))
    val vecs = cands.map(_.getSeq[Float](1).toArray)
    val rels = cands.map(_.getDouble(2))
    val n = ids.length
    val picked = new Array[Int](math.min(k, n))
    val isPicked = new Array[Boolean](n)
    var step = 0
    while (step < picked.length) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!isPicked(i)) {
          var maxSim = Double.NegativeInfinity
          var j = 0
          while (j < step) {
            val s = cosSim(vecs(i), vecs(picked(j)))
            if (s > maxSim) maxSim = s
            j += 1
          }
          // no picked yet → the diversity term vanishes (max over the
          // empty set is 0 by MMR convention)
          if (step == 0) maxSim = 0.0
          val score = lambda * rels(i) - (1.0 - lambda) * maxSim
          if (score > bestScore ||
              (score == bestScore && (best < 0 || ids(i) < ids(best)))) {
            bestScore = score; best = i
          }
        }
        i += 1
      }
      picked(step) = best
      isPicked(best) = true
      step += 1
    }
    val rows = picked.zipWithIndex.map { case (i, r) =>
      // HALF_UP to match SQL round() on both engines
      val rel4 = BigDecimal(rels(i))
        .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      ((r + 1).toLong, ids(i), rel4)
    }
    import spark.implicits._
    rows.toSeq.toDF("rank", "id", "rel")
  }
}
