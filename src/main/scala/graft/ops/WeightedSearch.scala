package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ann.AnnIndex

/** Multi-column weighted vector search —
  * `lantern.weighted_vector_search` and its `_cos`/`_l2sq` presets
  * (lantern_hnsw/sql/lantern.sql:673-819, presets :822-878).
  *
  * Exact variant: one scan, joint distance Σ wᵢ·dist(colᵢ, qᵢ), top-k
  * via TakeOrderedAndProject — linear, shuffle-free, the 100 TB-safe
  * default. ANN variant: per-column index search top-`ef` → union →
  * dropDuplicates(id) → fetch rows → re-sort by the joint metric
  * (exactly the reference's CTE UNION ALL + DISTINCT ON(id) shape).
  */
object WeightedSearch {

  /** One (weight, column, query) search term. */
  case class Term(weight: Double, vecCol: String, query: Array[Float],
      metric: String = "l2sq")

  private def jointDist(terms: Seq[Term]): Column =
    terms.map(t =>
      lit(t.weight) * VectorSearch.distance(t.metric, col(t.vecCol), lit(t.query)))
      .reduce(_ + _)

  /** Exact weighted top-k; `maxDist` filters on the joint distance
    * (`WHERE joint < max_dist` in the reference).
    */
  def exact(
      df: DataFrame,
      terms: Seq[Term],
      k: Int,
      tieBreak: Seq[Column] = Nil,
      maxDist: Option[Double] = None,
      distCol: String = "joint_dist"): DataFrame = {
    require(terms.nonEmpty && terms.size <= 3,
      s"graft: weighted search takes 1..3 terms, got ${terms.size}")
    val withDist = df.withColumn(distCol, jointDist(terms))
    val filtered = maxDist.fold(withDist)(md => withDist.where(col(distCol) < md))
    filtered.orderBy(col(distCol) +: tieBreak: _*).limit(k)
  }

  /** Cosine preset (`weighted_vector_search_cos`). */
  def exactCos(df: DataFrame, terms: Seq[Term], k: Int,
      tieBreak: Seq[Column] = Nil): DataFrame =
    exact(df, terms.map(_.copy(metric = "cos")), k, tieBreak)

  /** L2sq preset (`weighted_vector_search_l2sq`). */
  def exactL2sq(df: DataFrame, terms: Seq[Term], k: Int,
      tieBreak: Seq[Column] = Nil): DataFrame =
    exact(df, terms.map(_.copy(metric = "l2sq")), k, tieBreak)

  /** ANN variant: each term searches its own index artifact for `ef`
    * candidates; the union is deduped and re-ranked by the joint
    * metric against the source rows (candidate set is ef·terms rows —
    * the join back is a broadcast).
    */
  def ann(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      terms: Seq[(Term, String)], // (term, index artifact path)
      k: Int,
      ef: Int = 64): DataFrame = {
    require(terms.nonEmpty && terms.size <= 3,
      s"graft: weighted search takes 1..3 terms, got ${terms.size}")
    val candidates = terms
      .map { case (t, artifact) =>
        AnnIndex.searchDf(spark, artifact, t.query, ef).select(col("id"))
      }
      .reduce(_ unionByName _)
      .dropDuplicates("id")
    df.join(broadcast(candidates), df(idCol) === candidates("id"), "inner")
      .drop(candidates("id"))
      .withColumn("joint_dist", jointDist(terms.map(_._1)))
      .orderBy(col("joint_dist"), col(idCol))
      .limit(k)
  }
}
