package graft.baselines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.matcher.ERModel
import graft.schema.PairSchema

/** Landmark baseline explainer (reference landmark.py G5, lean
  * variant): the opposite record's attribute tokens are injected into
  * the varied side as "landmarks" before LIME-style mask sampling —
  * perturbations can then both drop original tokens and adopt landmark
  * tokens, which is what distinguishes Landmark from plain LIME
  * (landmark.py:99-257 double-entity generation). The surrogate fit and
  * mask machinery are shared with [[Mojito]].
  */
object Landmark {

  /** @param side which record to perturb ("l" or "r"); the other record
    *             provides the landmark tokens
    */
  def explain(
      lRecord: DataFrame,
      rRecord: DataFrame,
      model: ERModel,
      side: String = "l",
      numSamples: Int = 100,
      seed: Long = 42L,
      schema: PairSchema = PairSchema.default): DataFrame = {

    val (varied, landmark) = if (side == "l") (lRecord, rRecord) else (rRecord, lRecord)
    val common = varied.columns.toSet
      .intersect(landmark.columns.toSet)
      .filter(_ != "id")

    // inject per-attribute landmark tokens into the varied record
    val lmRow = landmark.head()
    val augmented = common.foldLeft(varied) { (df, a) =>
      val lmText = String.valueOf(lmRow.getAs[Any](a))
      df.withColumn(a,
        concat_ws(" ", coalesce(col(a).cast("string"), lit("")), lit(lmText)))
    }

    val (lAug, rAug) = if (side == "l") (augmented, rRecord) else (lRecord, augmented)
    Mojito.explain(lAug, rAug, model, side, numSamples, seed, schema)
  }
}
