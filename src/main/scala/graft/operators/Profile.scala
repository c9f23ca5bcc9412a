package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling: the data-quality report a training-data
  * pipeline runs before anything else touches a new corpus drop. For
  * every requested column, ONE scan produces rows, nulls, distinct
  * count, and min/max — long-form, one output row per column.
  *
  * Two paths with the same output schema:
  *   - [[exact]]: true `COUNT(DISTINCT)` per column. Spark plans
  *     multiple distinct aggregates through a single Expand (each input
  *     row replicated once per distinct group), so it is still one scan
  *     — but the shuffle carries |rows| × |columns| records. The oracle
  *     surface, and fine up to mid scale.
  *   - [[sketch]]: HyperLogLog++ (`approx_count_distinct`) — partial
  *     aggregation everywhere, shuffle carries only sketch buffers
  *     (constant per column), relative error ~`rsd`. The 100 TB path.
  *
  * min/max are emitted as strings so heterogeneous column types share
  * one schema; values are computed in the column's NATIVE type first
  * (numeric min, not lexicographic) and cast after.
  */
object Profile {

  private def legs(column: String,
      distinct: Column => Column): Seq[Column] = {
    val c = col(column)
    Seq(
      count(lit(1)).as(s"__n_$column"),
      count(c).as(s"__nn_$column"),
      distinct(c).as(s"__nd_$column"),
      min(c).cast("string").as(s"__min_$column"),
      max(c).cast("string").as(s"__max_$column"))
  }

  private def profile(df: DataFrame, columns: Seq[String],
      distinct: Column => Column): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val allLegs = cols.flatMap(legs(_, distinct))
    val wide = df.agg(allLegs.head, allLegs.tail: _*)
    // reshape long: one row per column (stack of 6-field tuples)
    val fields = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__n_$c").as("n_rows"),
        (col(s"__n_$c") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    wide.select(explode(array(fields: _*)).as("p")).select("p.*")
  }

  /** Exact distinct counts (one scan through a multi-distinct Expand). */
  def exact(df: DataFrame, columns: String*): DataFrame =
    profile(df, columns, countDistinct(_))

  /** HLL++ distinct counts: one scan, partial agg, constant-size
    * shuffle — the profile to run on the full corpus.
    */
  def sketch(df: DataFrame, columns: Seq[String] = Seq.empty,
      rsd: Double = 0.05): DataFrame =
    profile(df, columns, approx_count_distinct(_, rsd))
}
