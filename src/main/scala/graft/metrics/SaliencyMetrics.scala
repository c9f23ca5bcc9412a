package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Saliency explanation-quality metrics (reference metrics/saliency.py).
  *
  * Faithfulness (get_faithfulness, saliency.py:138-173): for each
  * ablation threshold, blank the top-k most-salient attributes of every
  * explained test pair, re-evaluate the model, and report the AUC of the
  * F1-vs-threshold curve. The per-threshold ablation is a single
  * withColumns batch + one distributed evaluation job; the tiny
  * threshold loop stays on the driver as in the reference.
  */
object SaliencyMetrics {

  val defaultThresholds: Seq[Double] = Seq(0.1, 0.2, 0.33, 0.5, 0.7, 0.9)

  /** F1 of threshold-at-0.5 match predictions vs `label` (A15 shape:
    * one pass confusion aggregation).
    */
  def f1(scored: DataFrame): Double = {
    val row = scored.agg(
      sum(when(col("match_score") >= 0.5 && col("label") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("match_score") >= 0.5 && col("label") === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(col("match_score") < 0.5 && col("label") === 1, 1L).otherwise(0L)).as("fn"))
      .head()
    val tp = row.getLong(0).toDouble
    val fp = row.getLong(1).toDouble
    val fn = row.getLong(2).toDouble
    val p = if (tp + fp == 0) 0.0 else tp / (tp + fp)
    val r = if (tp + fn == 0) 0.0 else tp / (tp + fn)
    if (p + r == 0) 0.0 else 2 * p * r / (p + r)
  }

  /** A13 faithfulness AUC. `saliencyRank` is the global attribute
    * ranking (most salient first) to ablate — the uniform-ranking
    * simplification of the reference's per-row ranking; per-row
    * ablation lifts to a `when(rank(row) ...)` batch the same way.
    */
  def faithfulnessAuc(
      labeledPairs: DataFrame,
      scoreFn: DataFrame => DataFrame,
      saliencyRank: Seq[String],
      thresholds: Seq[Double] = defaultThresholds): (Seq[Double], Double) = {
    val nAttrs = saliencyRank.size
    val scores = thresholds.map { t =>
      val topK = (t * nAttrs).toInt
      val ablated = saliencyRank.take(topK).foldLeft(labeledPairs) { (df, a) =>
        if (df.columns.contains(a)) df.withColumn(a, lit("")) else df
      }
      f1(scoreFn(ablated))
    }
    (scores, trapezoidAuc(thresholds, scores))
  }

  /** A13 faithfulness with the reference's per-row ranking
    * (saliency.py:155-168): each pair's own top-k salient attributes are
    * blanked. `saliency` is long-form (ltable_id, rtable_id, attribute,
    * score); ablation is a per-pair rank map joined onto the pairs.
    *
    * ALL thresholds evaluate in ONE distributed job: the pair frame
    * fans out T× against a literal threshold table (each replica
    * ablates at its own top-k), one model evaluation scores the whole
    * fan-out, and one grouped aggregation yields every threshold's
    * confusion counts. The per-threshold loop the reference runs —
    * and the first cut here ran — costs T corpus scans + T model
    * passes; at 100 TB that is the difference between one pass and
    * six. F1/AUC arithmetic over the exact counts is driver-side and
    * unchanged, so the frozen q170 golden is invariant to this plan
    * change.
    *
    * CONTRACT: `scoreFn` must be ROW-LOCAL — it sees the threshold
    * fan-out (each input pair replicated T×, once per threshold, each
    * replica ablated at its own top-k) as one frame, so a scorer with
    * cross-row behavior (dataset-level normalization, a pipeline fit
    * on its scoring input) would silently diverge from the
    * per-threshold reference semantics. Every [[graft.matcher.ERModel]]
    * scorer satisfies this (they score row by row).
    */
  def faithfulnessAucPerRow(
      labeledPairs: DataFrame,
      saliency: DataFrame,
      scoreFn: DataFrame => DataFrame,
      attrs: Seq[String],
      thresholds: Seq[Double] = defaultThresholds): (Seq[Double], Double) = {
    import org.apache.spark.sql.expressions.Window
    val spark = labeledPairs.sparkSession
    val w = Window.partitionBy(col("ltable_id"), col("rtable_id"))
      .orderBy(col("score").desc, col("attribute").asc)
    val rankMap = saliency
      .withColumn("rnk", row_number().over(w))
      .groupBy(col("ltable_id").as("__rl"), col("rtable_id").as("__rr"))
      .agg(map_from_entries(collect_list(struct(col("attribute"), col("rnk"))))
        .as("__ranks"))
    val joined = labeledPairs.join(rankMap,
      labeledPairs("ltable_id") === col("__rl") &&
        labeledPairs("rtable_id") === col("__rr"), "left")

    import spark.implicits._
    val tdf = broadcast(thresholds.map(t => (t, (t * attrs.size).toInt))
      .toDF("__t", "__topk"))
    val fanned = attrs.foldLeft(joined.crossJoin(tdf)) { (df, a) =>
      df.withColumn(a,
        when(coalesce(element_at(col("__ranks"), a), lit(Int.MaxValue))
          <= col("__topk"), lit("")).otherwise(col(a)))
    }.drop("__rl", "__rr", "__ranks")
    val confusion = scoreFn(fanned)
      .groupBy(col("__t"))
      .agg(
        sum(when(col("match_score") >= 0.5 && col("label") === 1, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("match_score") >= 0.5 && col("label") === 0, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("match_score") < 0.5 && col("label") === 1, 1L)
          .otherwise(0L)).as("fn"))
      .collect()
      .map(r => r.getDouble(0) ->
        ((r.getLong(1).toDouble, r.getLong(2).toDouble, r.getLong(3).toDouble)))
      .toMap
    val scores = thresholds.map { t =>
      // empty labeledPairs → no groups at all; every threshold is (0,0,0)
      val (tp, fp, fn) = confusion.getOrElse(t, (0.0, 0.0, 0.0))
      val p = if (tp + fp == 0) 0.0 else tp / (tp + fp)
      val r = if (tp + fn == 0) 0.0 else tp / (tp + fn)
      if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    }
    (scores, trapezoidAuc(thresholds, scores))
  }

  /** Trapezoid-rule AUC (the sklearn.metrics.auc the reference calls). */
  def trapezoidAuc(xs: Seq[Double], ys: Seq[Double]): Double =
    xs.zip(ys).sliding(2).collect {
      case Seq((x1, y1), (x2, y2)) => (x2 - x1) * (y1 + y2) / 2.0
    }.sum
}
