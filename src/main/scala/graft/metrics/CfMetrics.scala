package graft.metrics

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Counterfactual explanation-quality metrics (reference
  * metrics/counterfactual.py:4-64): validity, proximity, sparsity,
  * diversity — each a distributed aggregation over the CF example
  * frame instead of the reference's Python row loops.
  */
object CfMetrics {

  /** A9 validity: fraction of CF rows whose score flips the predicted
    * class (reference counterfactual.py:4-15). `classScoreCol` is the
    * score column of the original class.
    */
  def validity(cf: DataFrame, classScoreCol: String): Double =
    if (cf.isEmpty) 0.0
    else cf.agg(avg(when(col(classScoreCol) < 0.5, 1.0).otherwise(0.0)))
      .head().getDouble(0)

  /** Per-row changed-attribute fraction vs an original record: the inner
    * quantity of proximity (reference counterfactual.py:18-33). The
    * original is a driver-side map attr → value (one explained record).
    */
  private def changedFraction(attrs: Seq[String], original: Row): Column = {
    val flags = attrs.map { a =>
      val orig = original.getAs[Any](a)
      when(col(a).cast("string") === lit(String.valueOf(orig)), 0.0).otherwise(1.0)
    }
    flags.reduce(_ + _) / lit(attrs.size.toDouble)
  }

  /** A10 proximity: 1 - mean changed-attribute fraction. */
  def proximity(cf: DataFrame, original: Row, attrs: Seq[String]): Double =
    if (cf.isEmpty) 0.0
    else 1.0 - cf.agg(avg(changedFraction(attrs, original))).head().getDouble(0)

  /** A12 sparsity (reference counterfactual.py:63-64):
    * 1 - meanChanged / (nAttrs / 2).
    */
  def sparsity(cf: DataFrame, original: Row, attrs: Seq[String]): Double = {
    if (cf.isEmpty) return 0.0
    val meanChanged = cf.agg(avg(changedFraction(attrs, original)))
      .head().getDouble(0)
    1.0 - meanChanged / (attrs.size / 2.0)
  }

  /** A11 diversity: mean pairwise attribute-difference ratio across CF
    * rows (reference counterfactual.py:36-60, an O(n²) double loop) —
    * here a self cross join over the (tiny: t=10 in the reference
    * drivers) CF sample, computed in parallel.
    */
  def diversity(cf: DataFrame, attrs: Seq[String]): Double = {
    val n = cf.count()
    if (n < 2) return 0.0
    val withId = cf.withColumn("__i", monotonically_increasing_id())
    val a = withId.select(col("__i").as("ia") +:
      attrs.map(c => col(c).cast("string").as("a_" + c)): _*)
    val b = withId.select(col("__i").as("ib") +:
      attrs.map(c => col(c).cast("string").as("b_" + c)): _*)
    val diffRatio = attrs.map(c =>
      when(col("a_" + c) === col("b_" + c), 0.0).otherwise(1.0))
      .reduce(_ + _) / lit(attrs.size.toDouble)
    a.crossJoin(b).filter(col("ia") =!= col("ib"))
      .agg(avg(diffRatio)).head().getDouble(0)
  }
}
