package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Time-series resampling to OHLC bars (open/high/low/close + count +
  * sum) — the standard downsampling step before any windowed analytics
  * over event streams (TWAP q126 consumes exactly such bars upstream).
  *
  * Open/close are selected by `min_by`/`max_by` over a (ts, tieCol)
  * struct — a deterministic total order even when timestamps collide —
  * so the result is partition-order-free, and the whole resample is
  * ONE partial-aggregated shuffle keyed by (series, bucket): min_by/
  * max_by carry a single struct of state per group through the
  * map-side combine (no window function, no per-group sort, no
  * hot-series single-reducer stage — the q107 TopK lesson applied to
  * first/last).
  */
object Resample {

  /** One OHLC bar per (keyCol, truncated ts): columns n, low, high,
    * open, close, sum over `valueCol` (expected integer-quantized,
    * e.g. cents — keeps the sums exact and order-free).
    */
  def ohlc(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, unit: String = "hour",
      bucketName: String = "window_start"): DataFrame = {
    val ord: Column = struct(col(tsCol), col(tieCol))
    val fmt = unit match {
      case "day" => "yyyy-MM-dd"
      case _ => "yyyy-MM-dd HH:mm"
    }
    df.withColumn(bucketName, date_format(date_trunc(unit, col(tsCol)), fmt))
      .groupBy(col(keyCol), col(bucketName))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("low"),
        max(col(valueCol)).as("high"),
        min_by(col(valueCol), ord).as("open"),
        max_by(col(valueCol), ord).as("close"),
        sum(col(valueCol)).as("sum_value"))
      .orderBy(col(keyCol), col(bucketName))
  }
}
