package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.xxhash64

/** Deterministic, order-invariant sampling.
  *
  * `df.limit(n)` takes whichever partitions list first — at 100 TB
  * that is "whatever file sorted first", a skewed sample that biases
  * k-means codebooks/centroids toward one shard's distribution (the
  * reference samples randomly: lantern_cli/src/index_autotune/
  * mod.rs:188-218). Hash-ordering instead gives a pseudo-random sample
  * that is a pure function of the DATA (invariant to partition layout,
  * file order, and parallelism), reproducible across runs, and costs
  * one pass with per-partition top-n + driver merge
  * (TakeOrderedAndProject) — no count job, no full sort.
  */
object Sampling {

  /** Up to `n` rows of `df`, chosen as the global top-`n` by
    * xxhash64 of `keys` (use a stable id or the sampled value itself).
    */
  def hashSample(df: DataFrame, n: Int, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "graft: hashSample needs at least one key column")
    df.orderBy(xxhash64(keys: _*)).limit(n)
  }

  /** Deterministic STRATIFIED sample: up to `n` rows per group, chosen
    * by the seeded acceptance hash of each row's id (eval-set carving,
    * per-domain audits, balanced fine-tuning pools). One
    * hash-partitioned window on the group key — layout-invariant,
    * reproducible, no driver state; per-task memory is one group's
    * window frame. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      n: Int,
      seed: String): DataFrame = {
    require(n > 0, s"graft: stratifiedSample needs n > 0, got $n")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val w = Window.partitionBy(col(groupCol))
      .orderBy(graft.ops.Mixture.sampleHash(col(idCol), seed), col(idCol))
    df.withColumn("__sr", row_number().over(w))
      .where(col("__sr") <= n)
      .drop("__sr")
  }
}
