package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares trend — "is this metric drifting,
  * and how fast, per segment" as ONE map-side-combined census: the
  * analytics staple behind per-source quality-over-time monitoring and
  * per-type event-rate trendlines. Inputs are integer-quantized by the
  * caller (seconds/hours for x, cents for y — the q126 rule), the five
  * OLS moments (n, Σx, Σy, Σxy, Σx²) accumulate EXACTLY in BIGINT in
  * one shuffle, and the slope emerges from the closed form
  * `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`, evaluated in double FROM the
  * exact integer moments and quantized to `floor(slope · quant)`.
  *
  * Portability: the moments are exact integers in any engine; the
  * double conversions and the two IEEE multiply/subtract/divide steps
  * are bit-deterministic given identical integers, so `slope_q`
  * hash-matches a SQL replay. Callers must keep x·y and x² within
  * BIGINT — quantize x to a coarse-enough unit (hours, not micros).
  *
  * Scale shape: a single groupBy census — partial aggregation
  * map-side, k rows out; no second pass, no window, no join.
  */
object Regression {

  def trendCensus(df: DataFrame, groupCols: Seq[String], x: Column,
      y: Column, quant: Long = 1000000L): DataFrame = {
    val g = df
      .select(groupCols.map(col) :+ x.cast("long").as("__x")
        :+ y.cast("long").as("__y"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sum_x"),
        sum(col("__y")).as("sum_y"),
        sum(col("__x") * col("__y")).as("sum_xy"),
        sum(col("__x") * col("__x")).as("sum_xx"))
    val nd = col("n").cast("double")
    val num = nd * col("sum_xy").cast("double") -
      col("sum_x").cast("double") * col("sum_y").cast("double")
    val den = nd * col("sum_xx").cast("double") -
      col("sum_x").cast("double") * col("sum_x").cast("double")
    g.withColumn("slope_q",
      when(den === 0.0, lit(null).cast("long"))
        .otherwise(floor(num / den * lit(quant.toDouble)).cast("long")))
  }

  /** Per-group Pearson correlation under the same exact-moments rule:
    * six BIGINT moments in one census, `r = (nΣxy − ΣxΣy) /
    * sqrt((nΣx² − (Σx)²)(nΣy² − (Σy)²))` in deterministic double,
    * quantized to `floor(r · quant)`; null when either side has zero
    * variance. Same one-shuffle scale shape as [[trendCensus]].
    */
  def corrCensus(df: DataFrame, groupCols: Seq[String], x: Column,
      y: Column, quant: Long = 1000000L): DataFrame = {
    val g = df
      .select(groupCols.map(col) :+ x.cast("long").as("__x")
        :+ y.cast("long").as("__y"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sum_x"), sum(col("__y")).as("sum_y"),
        sum(col("__x") * col("__y")).as("sum_xy"),
        sum(col("__x") * col("__x")).as("sum_xx"),
        sum(col("__y") * col("__y")).as("sum_yy"))
    val nd = col("n").cast("double")
    val num = nd * col("sum_xy").cast("double") -
      col("sum_x").cast("double") * col("sum_y").cast("double")
    val dx = nd * col("sum_xx").cast("double") -
      col("sum_x").cast("double") * col("sum_x").cast("double")
    val dy = nd * col("sum_yy").cast("double") -
      col("sum_y").cast("double") * col("sum_y").cast("double")
    g.withColumn("corr_q",
      when(dx <= 0.0 || dy <= 0.0, lit(null).cast("long"))
        .otherwise(floor(num / sqrt(dx * dy) * lit(quant.toDouble))
          .cast("long")))
  }
}
