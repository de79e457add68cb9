package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the classic answer to HOT KEYS in large-large
  * joins. A plain hash join sends every row of a key to ONE reducer;
  * at 100 TB one viral user / null-ish default key turns into a
  * single straggler task holding gigabytes. Salting splits each hot
  * key across `salts` reducers: the LEFT (big, skewed) side gets a
  * deterministic per-row salt, the RIGHT side replicates each key row
  * `salts` times (one per salt value), and the join key becomes
  * (key, salt) — same results, `salts`-way parallel hot keys.
  *
  * Trade-off made explicit: the right side's shuffle volume multiplies
  * by `salts`, so this is for joins whose right side is too big to
  * broadcast but far smaller than the left (classifier outputs,
  * per-user aggregates) — broadcast remains the answer below the
  * autoBroadcast threshold, and AQE's skew-join split handles
  * sort-merge cases; salting is the portable, planner-independent
  * form that also works for aggregations-after-join shapes.
  *
  * The salt is `pmod(xxhash64(left row id), salts)` — deterministic
  * (re-runs produce identical partitioning, no `rand()`
  * non-determinism under task retries, which can DUPLICATE OR DROP
  * rows when a retried task re-draws its random salts).
  */
object SkewJoin {

  /** Inner/left salted equi-join of `left` and `right` on `key`.
    * `saltBy` must be a deterministic per-row expression on the LEFT
    * side (a stable row id). Right-side columns keep their names;
    * duplicate names must be resolved by the caller (as with plain
    * joins). */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltBy: Column,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"graft: salts must be positive, got $salts")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"graft: salted join supports inner/left, got '$joinType'")
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltBy), lit(salts.toLong)).cast("int"))
    // replicate each right row once per salt value — explode of a
    // literal range, no shuffle on its own
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
