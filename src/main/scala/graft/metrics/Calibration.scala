package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Matcher-confidence calibration and chance-corrected agreement —
  * the two evaluation surfaces a scored ER matcher (§2.9) needs beyond
  * q24's P/R/F1: is the score a probability (ECE), and is the
  * agreement with truth better than class-prior luck (Cohen's κ)?
  * Both are standard public formulas (Guo et al. 2017 for ECE;
  * Cohen 1960 for κ).
  *
  * Portability: scores enter as INTEGER rationals (num/den — e.g.
  * Jaccard's |∩|/|∪|), so bins are exact integer arithmetic and the
  * per-pair confidence quantization `floor(1e9·num/den)` is the IEEE
  * double division both engines share (q40 rule). κ uses the
  * cross-product form 2·(tp·tn − fp·fn) / ((tp+fp)(fp+tn)+(tp+fn)(fn+tn))
  * on exact-integer doubles — no intermediate ratio, no overflow below
  * 2^53 products (counts < ~9×10^7).
  */
object Calibration {

  /** Per-bin calibration census over pairs scored by the rational
    * num/den ∈ [0,1]: bin b = min(floor(num·bins/den), bins−1), the
    * mul-then-div IEEE order mirrored by the oracle; per bin the pair
    * count, positive count,
    * 1e-9-quantized confidence sum, and the ECE numerator contribution
    * gap_q = |conf_sum_q − n_pos·1e9| (so ECE = Σ gap_q / (N·1e9)).
    * One scan over the pairs, one ~`bins`-group partial aggregation —
    * nothing here is pair-order- or partition-dependent.
    */
  def calibrationCensus(pairs: DataFrame, numCol: String, denCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    val num = col(numCol).cast("long")
    val den = col(denCol).cast("long")
    val bin = least(floor(num.cast("double") * lit(bins) / den.cast("double")),
      lit(bins - 1).cast("double")).cast("long")
    val confQ = floor(num.cast("double") / den.cast("double") * lit(1e9)).cast("long")
    pairs
      .withColumn("bin", bin)
      .withColumn("conf_q", confQ)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        sum(col("conf_q")).as("conf_sum_q"))
      .withColumn("gap_q", abs(col("conf_sum_q") - col("n_pos") * lit(1000000000L)))
      .orderBy(col("bin"))
  }

  /** Cohen's κ from a one-row confusion-count frame (tp/fp/fn/tn),
    * appended as `kappa_q` (1e-9-quantized; 0 when the denominator is
    * zero, i.e. a degenerate single-class confusion).
    */
  def withCohenKappa(confusion: DataFrame): DataFrame = {
    def d(c: String): Column = col(c).cast("double")
    val numK = lit(2.0) * (d("tp") * d("tn") - d("fp") * d("fn"))
    val denK = (d("tp") + d("fp")) * (d("fp") + d("tn")) +
      (d("tp") + d("fn")) * (d("fn") + d("tn"))
    confusion.withColumn("kappa_q",
      when(denK === 0.0, lit(0L))
        .otherwise(floor(numK / denK * lit(1e9)).cast("long")))
  }
}
