package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-LINEAR interpolation of missing values — the sibling of q162's
  * forward fill for series where a flat carry-forward biases the gap
  * (sensor dropouts, sampled gauges): each null run is filled on the
  * straight line between its surrounding non-null values, by row
  * position within the gap.
  *
  * All integer arithmetic on a quantized value column: for a null row
  * at distance k into a gap of span m between values a and b, the fill
  * is a + floor((b−a)·k / m), with floor division computed as
  * (num − pmod(num, m)) / m — the subtract-mod form makes the quotient
  * an exact multiple, so truncating and flooring agree in every engine
  * and the double division is exact below 2^53 (|b−a|·m bounded by
  * value-range × group size — document-checked, not assumed, at the
  * call site).
  *
  * Scale shape: two frame-bounded window passes over the same
  * (partition, order) sort — Spark evaluates both in ONE shuffle +
  * sort per partition key, state O(1) per row. No joins, no collect.
  */
object Interpolate {

  /** Appends `li_filled`: the value column with interior null runs
    * linearly interpolated (nulls before the first or after the last
    * non-null value stay null).
    */
  def withLinearFill(df: DataFrame, partCol: String, orderCols: Seq[Column],
      valueCol: String): DataFrame = {
    val v = col(valueCol)
    val wAll = Window.partitionBy(col(partCol)).orderBy(orderCols: _*)
    val wPrev = wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = wAll.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rn = row_number().over(wAll)
    val tagged = df.withColumn("__rn", rn)
    val prevRn = last(when(v.isNotNull, col("__rn")), ignoreNulls = true).over(wPrev)
    val prevV = last(v, ignoreNulls = true).over(wPrev)
    val nextRn = first(when(v.isNotNull, col("__rn")), ignoreNulls = true).over(wNext)
    val nextV = first(v, ignoreNulls = true).over(wNext)
    val k = col("__rn") - col("__prev_rn")
    val m = col("__next_rn") - col("__prev_rn")
    val num = (col("__next_v") - col("__prev_v")) * k
    val interp = col("__prev_v") +
      ((num - pmod(num, m)) / m).cast("long")
    tagged
      .withColumn("__prev_rn", prevRn).withColumn("__prev_v", prevV)
      .withColumn("__next_rn", nextRn).withColumn("__next_v", nextV)
      .withColumn("li_filled", coalesce(v,
        when(col("__prev_v").isNotNull && col("__next_v").isNotNull, interp)))
      .drop("__rn", "__prev_rn", "__prev_v", "__next_rn", "__next_v")
  }
}
