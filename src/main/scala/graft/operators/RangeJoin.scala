package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pure range join (point-in-interval with NO equi key): the lookup
  * shape of IP→geo ranges, incident windows × event streams, sensor
  * calibration epochs — where nothing equates and Spark's only plan is
  * BroadcastNestedLoopJoin, O(|points|·|intervals|) comparisons.
  *
  * Bucketizing manufactures the missing equi key (the RANGE_JOIN-hint
  * technique): pick a cell width W, explode each interval to every
  * width-W cell it overlaps (fan-out ⌈len/W⌉+1, bounded when intervals
  * are bounded), map each point to its one cell, hash-join on the cell,
  * and re-check the exact range predicate. Work drops to
  * O(pairs-per-cell) and both sides shuffle-partition by cell — the
  * 100 TB shape. Choose W near the typical interval length: too small
  * multiplies interval copies, too large multiplies false candidates
  * the post-filter discards.
  */
object RangeJoin {

  /** Inner join of `a` rows to every `b` row whose [bLo, bHi] interval
    * OVERLAPS [aLo, aHi] (inclusive ends; `lo ≤ hi` on both sides,
    * non-negative longs). Same cell manufacture as
    * [[pointInInterval]], with the overlap twist: an overlapping pair
    * shares every cell both intervals cover, so the join keeps only the
    * match in the FIRST shared cell — `cell == max(aLo, bLo) div W` —
    * making each pair emit exactly once without a distinct.
    */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlapCols = a.columns.toSet.intersect(b.columns.toSet)
    require(overlapCols.isEmpty,
      s"column names must be disjoint, both sides have: $overlapCols")
    val ae = a.withColumn("__cell_a", explode(sequence(
      expr(s"$aLo div ${bucketWidth}L"),
      expr(s"$aHi div ${bucketWidth}L"))))
    val be = b.withColumn("__cell_b", explode(sequence(
      expr(s"$bLo div ${bucketWidth}L"),
      expr(s"$bHi div ${bucketWidth}L"))))
    ae.join(be,
        col("__cell_a") === col("__cell_b") &&
          col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
          col("__cell_a") === greatest(
            expr(s"$aLo div ${bucketWidth}L"),
            expr(s"$bLo div ${bucketWidth}L")))
      .drop("__cell_a", "__cell_b")
  }

  /** Inner join of `points` rows to every `intervals` row whose
    * [loCol, hiCol] (inclusive both ends) contains the point. Output
    * carries all columns of both frames — names must be disjoint.
    * Values must be non-negative longs (epoch micros, IPv4 ints, …):
    * cell assignment uses integral division, which equals floor there.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"column names must be disjoint, both sides have: $overlap")
    val iv = intervals.withColumn("__cell", explode(sequence(
      expr(s"$loCol div ${bucketWidth}L"),
      expr(s"$hiCol div ${bucketWidth}L"))))
    val pt = points.withColumn("__p_cell",
      expr(s"$pointCol div ${bucketWidth}L"))
    pt.join(iv,
        col("__p_cell") === col("__cell") &&
          col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__cell", "__p_cell")
  }
}
