package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the data-layout lever for
  * MULTI-column scan pruning. Parquet row-group min/max stats prune
  * only along the sort order: sorting by `user_id` makes `user_id`
  * predicates skip row groups but leaves `ts` predicates scanning
  * everything. Writing `sortWithinPartitions(zorderKey(a, b))`
  * clusters BOTH columns' value ranges into blocks, so either
  * predicate skips most row groups — the trick behind
  * Delta/Iceberg OPTIMIZE ZORDER, expressed as a plain column.
  *
  * The key interleaves the low bits of non-negative integer columns.
  * Built from fixed shift/mask/add built-ins unrolled at plan-build
  * time — whole-stage codegen, no lambdas, and exactly replayable in
  * ANSI SQL. Values must fit their bit budgets (range-guarded; clamp
  * or bucket upstream — e.g. `pmod(col, 65536)` — because silently
  * dropping high bits would interleave the WRONG locality).
  */
object ZOrder {

  /** Morton key of `(x, y)` over the low `bits` bits of each —
    * the 2-ary case of [[zorderKeyN]] (x even positions, y odd). */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column =
    zorderKeyN(Seq(x -> bits, y -> bits))

  /** N-ary Morton key with PER-COLUMN bit budgets — real layout tuning
    * wants 3-4 dimensions (user, time, type) and rarely equal
    * resolution per dimension. Bit assignment is round-robin from the
    * LSB over the columns that still have bits left at each level:
    * with budgets (3, 2, 1) the output bit order is
    * `c0b0 c1b0 c2b0 c0b1 c1b1 c0b2` — equal budgets reduce to the
    * classic strided interleave (`pos = level·n + i`), so the 2-ary
    * key is unchanged, and exhausted columns simply drop out of later
    * rounds (their high-order locality is preserved by the budget
    * itself). Σ budgets ≤ 63 keeps the key a non-negative BIGINT.
    */
  def zorderKeyN(cols: Seq[(Column, Int)]): Column = {
    require(cols.size >= 2 && cols.size <= 8,
      s"graft: zorderKeyN takes 2..8 columns, got ${cols.size}")
    require(cols.forall { case (_, b) => b >= 1 && b <= 31 },
      s"graft: per-column zorder bits in [1,31], got ${cols.map(_._2)}")
    require(cols.map(_._2).sum <= 63,
      s"graft: zorder bit budgets sum to ${cols.map(_._2).sum} > 63")
    val guarded = cols.zipWithIndex.map { case ((c, b), i) =>
      val bound = 1L << b
      (when(c.cast("long") >= 0 && c.cast("long") < bound, c.cast("long"))
        .otherwise(raise_error(concat(
          lit(s"graft: zorderKeyN column $i outside [0, $bound): "),
          c.cast("string")))), b)
    }
    val maxBits = cols.map(_._2).max
    var pos = 0
    val terms = for {
      level <- 0 until maxBits
      (g, b) <- guarded
      if level < b
    } yield {
      val p = pos
      pos += 1
      shiftleft(shiftright(g, level).bitwiseAND(lit(1L)), p)
    }
    terms.reduce(_ + _)
  }
}
