package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout for MULTI-dimensional data skipping.
  *
  * A range layout on one column prunes scans filtered on that column
  * only; sorting by the bit-interleave of TWO keys bounds BOTH keys'
  * ranges inside every partition/file, so min-max statistics prune
  * scans filtered on either dimension (or both) — the Delta/Iceberg
  * OPTIMIZE ZORDER recipe. Fixing the top 2k bits of the z-value
  * confines each dimension to a 2^(bits−k)-wide band: file skipping
  * becomes quadtree-cell skipping.
  *
  * The interleave is pure integer bit arithmetic on non-negative keys
  * (shift/and/or — codegen'd, engine-portable, oracle-checkable), and
  * the physical layout is the [[Shard]] rule: one range exchange +
  * per-partition local sorts, never a global sort.
  */
object ZOrder {

  /** Morton interleave of two non-negative integer keys, `bits` bits
    * each: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    * Keys wider than `bits` bits must be range-reduced first (scale or
    * bucket) — high bits beyond the budget are dropped.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i))
    }
  }

  /** Writer-ready z-ordered layout: `zval` column, ranged into
    * `nPartitions` and locally sorted — each output file covers one
    * compact quadtree region of (a, b) space.
    */
  def layout(df: DataFrame, aCol: String, bCol: String, bits: Int,
      nPartitions: Int): DataFrame =
    df.withColumn("zval", zValue(col(aCol), col(bCol), bits))
      .repartitionByRange(nPartitions, col("zval"))
      .sortWithinPartitions(col("zval"))
}
