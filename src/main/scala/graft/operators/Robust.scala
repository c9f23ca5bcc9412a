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
}
