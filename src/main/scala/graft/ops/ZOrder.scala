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
  * The key interleaves the low `bits` bits of two non-negative
  * integer columns (x even positions, y odd). Built from fixed
  * shift/mask/add built-ins unrolled at plan-build time — whole-stage
  * codegen, no lambdas, and exactly replayable in ANSI SQL. Values
  * must fit `bits` bits (range-guarded; clamp or bucket upstream —
  * e.g. `pmod(col, 65536)` — because silently dropping high bits
  * would interleave the WRONG locality).
  */
object ZOrder {

  /** Morton key of `(x, y)` over the low `bits` bits of each. */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"graft: zorder bits in [1,31], got $bits")
    val bound = 1L << bits
    def guarded(c: Column, name: String): Column =
      when(c.cast("long") >= 0 && c.cast("long") < bound, c.cast("long"))
        .otherwise(raise_error(concat(
          lit(s"graft: zorderKey $name outside [0, $bound): "),
          c.cast("string"))))
    val gx = guarded(x, "x")
    val gy = guarded(y, "y")
    (0 until bits).map { b =>
      shiftleft(shiftright(gx, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(gy, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
  }
}
