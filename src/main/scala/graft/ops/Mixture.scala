package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.polyhash31

/** Deterministic data-mixture sampling — the "data recipe" stage of a
  * training pipeline: downsample each stratum (language, source
  * domain, quality band, …) to hit target output proportions.
  *
  * Every accept/reject decision is a pure function of (seed, row id):
  * a row is kept iff `polyhash31(seed ":" id) < floor(rate · 2³¹−1)`.
  * That makes runs reproducible across cluster sizes and retries
  * (no RNG state, no partition-order dependence), makes the sample
  * SQL-replayable for audits, and means re-running with a higher rate
  * yields a SUPERSET of the previous sample (the threshold only
  * moves up), which is what you want when growing a data recipe.
  *
  * Scale shape: rates come from one tiny per-group count aggregate
  * (rows = number of strata); the filter itself is a map-side
  * codegen'd expression — zero shuffle over the corpus.
  */
object Mixture {

  /** Modulus of [[graft.functions.PolyHash31]] — hash values are
    * uniform-ish in [0, Mod). */
  val Mod = 2147483647L

  /** Deterministic Bernoulli(rate) keep decision for a row id. */
  def keep(idCol: Column, seed: String, rate: Double): Column =
    sampleHash(idCol, seed) < lit(threshold(rate))

  /** The acceptance hash, uniform-ish in [0, 2³¹−1). A single
    * polynomial fold is NOT enough here: consecutive ids share a long
    * prefix, so their raw polyhashes sit in dense arithmetic clusters
    * and threshold acceptance becomes all-or-nothing per cluster
    * (measured: 27 kept of an expected ~200 on 500 consecutive ids).
    * Remixing two folds with a large multiplicative stride
    * equidistributes those clusters mod the prime — measured
    * acceptance lands within ~3% of the nominal rate. Still exactly
    * SQL-replayable. */
  def sampleHash(idCol: Column, seed: String): Column = {
    val s = concat(lit(seed + ":"), idCol.cast("string"))
    pmod(
      polyhash31(s) * lit(MixStride) + polyhash31(s, 37),
      lit(Mod))
  }

  /** Stride for the two-fold remix; 31·stride ≫ Mod so neighbouring
    * raw hashes land far apart. `poly31 · stride + poly37 < 2⁶²` —
    * no long overflow even under ANSI mode. */
  val MixStride = 1103515245L

  /** Integer acceptance threshold for a rate in [0,1] — floor keeps
    * the comparison exact (and SQL-replayable) on both engines. */
  def threshold(rate: Double): Long =
    math.floor(math.max(0.0, math.min(1.0, rate)) * Mod).toLong

  /** Keep each group at an explicit per-group rate (absent groups use
    * `defaultRate`). Map-side only: the rate table rides as a literal
    * CASE expression, no join, no shuffle. */
  def sampleByRates(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      rates: Map[String, Double],
      seed: String,
      defaultRate: Double = 1.0): DataFrame = {
    val thr = rates.foldLeft(lit(threshold(defaultRate))) {
      case (acc, (g, r)) =>
        when(col(groupCol) === lit(g), lit(threshold(r))).otherwise(acc)
    }
    df.where(sampleHash(col(idCol), seed) < thr)
  }

  /** Per-group sampling plan to approximate a target output mixture:
    * for each group g with `share(g)` of a `targetRows`-row output,
    * rate(g) = min(1, targetRows·share(g) / count(g)). Groups not in
    * `shares` are dropped (rate 0). Returns (group, count, rate,
    * threshold) — rows = number of strata, computed from one count
    * aggregate. A group short of its quota keeps everything (rate
    * capped at 1): mixtures can only downsample, as in published
    * data-recipe pipelines (e.g. The Pile, FineWeb). */
  def mixturePlan(
      df: DataFrame,
      groupCol: String,
      shares: Map[String, Double],
      targetRows: Long): Seq[(String, Long, Double, Long)] = {
    val counts = df.groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    shares.toSeq.sortBy(_._1).map { case (g, share) =>
      val n = counts.getOrElse(g, 0L)
      val rate =
        if (n == 0L) 0.0 else math.min(1.0, targetRows * share / n)
      (g, n, rate, threshold(rate))
    }
  }

  /** Deterministic dataset-split assignment (train/val/test or any
    * named partition): the [[sampleHash]] of (seed, id) lands in
    * cumulative integer threshold bands of the declared weights, in
    * declared order — every row gets exactly one split, reproducibly,
    * with no shuffle and no stored state (the assignment IS the
    * function of (id, seed), so a 100 TB corpus re-derives it on
    * read). Weights must sum to 1 (±1e-9); the final band absorbs the
    * floor rounding. */
  def assignSplits(
      idCol: Column,
      seed: String,
      splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty, "graft: assignSplits needs at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"graft: split weights must sum to 1, got ${splits.map(_._2).sum}")
    val h = sampleHash(idCol, seed)
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(threshold)
    splits.init.zip(cum.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), t), acc) => when(h < t, name).otherwise(acc)
    }
  }

  /** Temperature-scaled mixture shares — exponentiated sampling
    * smoothing, share(g) ∝ count(g)^α (Conneau & Lample, NeurIPS'19
    * XLM; Devlin et al.'s mBERT exponent): α < 1 upweights
    * low-resource groups. Computed with a FIXED evaluation order
    * (groups sorted by name, sequential left-fold sum) so a SQL oracle
    * replaying the same order reproduces the doubles bit-for-bit; with
    * α = 0.5 every step is a single correctly-rounded IEEE op (sqrt,
    * ·, /). Driver state is one entry per group. */
  def temperatureShares(
      counts: Map[String, Long], alpha: Double): Seq[(String, Double)] = {
    // a null group key would NPE inside the name sort below with no
    // hint at the cause — fail with the fix spelled out instead
    require(counts.keysIterator.forall(_ != null),
      "graft: temperatureShares requires non-null group keys — " +
        "coalesce the group column to a sentinel (e.g. '__null__') first")
    val pows = counts.toSeq.sortBy(_._1)
      .map { case (g, n) => g -> math.pow(n.toDouble, alpha) }
    val z = pows.foldLeft(0.0)(_ + _._2)
    pows.map { case (g, p) => g -> p / z }
  }

  /** Sample to the temperature-α mixture of `targetRows` rows: one
    * count aggregate (groups-bounded), shares via
    * [[temperatureShares]], then the map-side deterministic filter —
    * same scale shape as [[sampleToMixture]]. */
  def sampleByTemperature(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      alpha: Double,
      targetRows: Long,
      seed: String): DataFrame = {
    val counts = df.groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val rates = temperatureShares(counts, alpha).map { case (g, share) =>
      g -> math.min(1.0, targetRows * share / counts(g))
    }.toMap
    sampleByRates(df, idCol, groupCol, rates, seed, defaultRate = 0.0)
  }

  /** Sample `df` to the target mixture: plan (tiny driver step) +
    * map-side deterministic filter. */
  def sampleToMixture(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      shares: Map[String, Double],
      targetRows: Long,
      seed: String): DataFrame = {
    val plan = mixturePlan(df, groupCol, shares, targetRows)
    val rates = plan.map { case (g, _, r, _) => g -> r }.toMap
    sampleByRates(df, idCol, groupCol, rates, seed, defaultRate = 0.0)
  }
}
