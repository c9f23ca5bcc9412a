package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single most recent right row
  * with the same key and timestamp at-or-before the left timestamp —
  * the "latest prior state" lookup (attribution, slowly-changing
  * dimensions, sensor alignment) that SQL expresses only as a
  * correlated LIMIT 1 subquery or a range join plus re-aggregation.
  *
  * Implemented as union + per-key ordered window, NOT a range join:
  * both inputs shuffle ONCE on the key, each partition sorts its
  * per-key run, and `last(_, ignoreNulls)` carries the newest right
  * payload forward into each left row. A range join
  * (`l.ts >= r.ts AND l.ts - r.ts <= horizon`) materializes every
  * (left, right-in-window) pair before re-aggregating to one — fan-out
  * that explodes exactly when keys are active; the window form's cost
  * is a sort, independent of how many right rows precede each left
  * row. No join operator appears in the plan at all (spec-pinned).
  *
  * Ties (several right rows sharing one key+timestamp) resolve to the
  * highest `tieCol` value — deterministic as long as `tieCol` is
  * unique per key+timestamp (an event id). Skew note: one hot key is
  * one sort-run; salt-split only helps if the horizon is also bounded
  * (each salt range then needs the previous range's tail broadcast) —
  * at that point prefer pre-aggregating the right side per (key,
  * coarse time bucket) first.
  */
object AsOf {

  /** Join `left` to the latest at-or-before `right` row per key.
    *
    * Right payload columns arrive null when no prior right row exists
    * (left rows are always preserved — LEFT OUTER semantics).
    *
    * @param payload right-side columns to carry; emitted with their
    *   own names, so they must not collide with left column names.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tieCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col) :+ col(tieCol).as("__tie"): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        col(tieCol).as("__tie"), payloadStruct.as("__p"),
        lit(null).cast(structType(left, leftCols)).as("__l")): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(r.schema("__tie").dataType).as("__tie"),
        lit(null).cast(r.schema("__p").dataType).as("__p"),
        struct(leftCols.map(col): _*).as("__l")): _*)
    // right rows sort before left rows at equal timestamps (side 0 < 1)
    // so an exactly-simultaneous right row IS visible to the left row;
    // among simultaneous right rows the largest tie value wins (last).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col("__l").getField(c).as(c)) ++
        payload.map(p => col("__match").getField(p).as(p)): _*)
  }

  /** Same, bounded: matches older than `horizonMicros` are nulled out
    * — the attribution-window form. Applied AFTER the as-of
    * resolution: the newest prior right row either is within the
    * horizon or the left row has no match at all (staler rows can
    * never win), so post-filtering equals pre-filtering without a
    * second pass over the right side. `rightTs` must be a column name
    * distinct from every left column (it is carried into the output).
    */
  def joinAsOfWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tieCol: String,
      payload: Seq[String], horizonMicros: Long): DataFrame = {
    val joined = joinAsOf(left, right, keys, leftTs, rightTs, tieCol,
      payload :+ rightTs)
    val keep = col(rightTs).isNotNull &&
      unix_micros(col(leftTs)) - unix_micros(col(rightTs)) <= horizonMicros
    (payload :+ rightTs).foldLeft(joined) { (d, p) =>
      d.withColumn(p, when(keep, col(p)))
    }
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
