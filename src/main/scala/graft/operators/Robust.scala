package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier statistics: median + MAD (median absolute
  * deviation) and a k·MAD outlier census — the anomaly gate that
  * survives the heavy-tailed value distributions a mean/stddev z-score
  * breaks on (one pathological record drags a mean; the median doesn't
  * move). The filtering shape quality pipelines use for "drop rows
  * whose metric is wildly off for their stratum".
  *
  * Execution shape: three passes over the frame — group medians, group
  * MADs (exact percentile aggregations, map-side partialed by Spark's
  * percentile ObjectHashAggregate), and the outlier census — with the
  * per-group scalars rejoined by BROADCAST (one row per group; the big
  * frame never shuffles on anything but the group key). At 100 TB the
  * documented swap is `approx_percentile` for both medians (the q67
  * rank-error contract); exact is the oracle surface.
  *
  * Portability: values enter as integer `cents` (scaled + rounded), so
  * the interpolated median is exactly k/2-representable and `|x −
  * med|` comparisons are double-exact across engines — the q103
  * no-last-ulp rule.
  */
object Robust {

  /** Per-group `(group, med, mad, n, n_outliers)` over an integral
    * value column; outlier ⇔ |v − median| > k·MAD.
    */
  def madOutlierCensus(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 3): DataFrame = {
    val v = col(valueCol).cast("long")
    val base = df.select(col(groupCol), v.as("__v"))
    val med = base.groupBy(col(groupCol))
      .agg(expr("percentile(__v, 0.5D)").as("__med"))
    val withMed = base.join(broadcast(med), groupCol)
      .withColumn("__ad", abs(col("__v") - col("__med")))
    val mad = withMed.groupBy(col(groupCol))
      .agg(expr("percentile(__ad, 0.5D)").as("__mad"))
    withMed.join(broadcast(mad), groupCol)
      .groupBy(col(groupCol))
      .agg(first(col("__med")).as("med"),
        first(col("__mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("__ad") > lit(k) * col("__mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Integer cents from a 2-decimal double column (portable scaling). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Winsorized census: values clipped at the exact per-group `lo`/`hi`
    * percentiles — the outlier-TAMING complement of
    * [[madOutlierCensus]] (which flags; winsorizing keeps the row but
    * bounds its leverage, the robust-mean recipe). Same broadcast
    * rejoin shape: two percentile aggregations, scalars broadcast
    * back, one census.
    *
    * Portability: restrict `lo`/`hi` to DYADIC fractions (0.25, 0.75,
    * 0.5 — binary-exact): the interpolation position `p·(n−1)` and
    * weight are then exact dyadic rationals over integer inputs, so
    * BOTH interpolation formulas engines use (`a + (b−a)·f` and
    * `a·(1−f) + b·f`) evaluate exactly and agree. A 0.1/0.9 clip
    * would put a non-dyadic factor into the interpolation and lose
    * the guarantee.
    *
    * The clipped sum is reported as `sum_winsorized_q` in QUARTER
    * units: each winsorized value is a quarter-integer, so `4·__w` is
    * an exact integer representable in double, and the LONG sum is
    * order-free with 2^63 headroom — a double SUM of the raw quarters
    * would only stay exact while the running total is below ~2^51
    * quarter-units, a bound a 100 TB aggregate can cross.
    */
  def winsorizedCensus(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double = 0.25, hi: Double = 0.75): DataFrame = {
    require(lo < hi && lo >= 0 && hi <= 1, "need 0 <= lo < hi <= 1")
    val base = df.select(col(groupCol), col(valueCol).cast("long").as("__v"))
    val th = base.groupBy(col(groupCol))
      .agg(expr(s"percentile(__v, ${lo}D)").as("__plo"),
        expr(s"percentile(__v, ${hi}D)").as("__phi"))
    base.join(broadcast(th), groupCol)
      .withColumn("__w", greatest(col("__plo"),
        least(col("__phi"), col("__v").cast("double"))))
      .groupBy(col(groupCol))
      .agg(first(col("__plo")).as("p_lo"),
        first(col("__phi")).as("p_hi"),
        count(lit(1)).as("n"),
        sum(when(col("__v").cast("double") < col("__plo"), 1L)
          .otherwise(0L)).as("n_clip_lo"),
        sum(when(col("__v").cast("double") > col("__phi"), 1L)
          .otherwise(0L)).as("n_clip_hi"),
        sum((col("__w") * 4).cast("long")).as("sum_winsorized_q"))
  }
}
