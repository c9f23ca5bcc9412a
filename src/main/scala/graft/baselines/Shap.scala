package graft.baselines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.matcher.ERModel
import graft.schema.PairSchema

/** Kernel-SHAP attribute attributions (reference baselines/shap_c.py:
  * 100-139, driven by eval.py:127-140).
  *
  * The reference samples 50 coalitions through shap.KernelExplainer
  * because its feature space is wide. Here features are the perturbed
  * side's ATTRIBUTES (the granularity eval.py actually explains at), so
  * the coalition lattice is tiny (2^M for M attributes) and we can do
  * strictly better than sampling: enumerate EVERY coalition, score all
  * of them in ONE distributed model pass, and compute exact Shapley
  * values from the collected (mask → score) table — deterministic, no
  * regression, no RNG. "Off" means blanking the attribute to the empty
  * string, the reference's off_value=''.
  */
object Shap {

  /** Exact Shapley attributions for the predicted class.
    *
    * @param side "l" to attribute the left record's attributes, "r" right
    * @return one row per perturbed-side attribute: (attribute, shap),
    *         with Σ shap = f(full) − f(empty) (efficiency).
    */
  def attributions(
      lRecord: DataFrame,
      rRecord: DataFrame,
      model: ERModel,
      side: String = "l",
      maxExactAttrs: Int = 16,
      schema: PairSchema = PairSchema.default): DataFrame = {

    val spark = lRecord.sparkSession
    val pair0 = schema.assemblePair(lRecord, rRecord)
    val prefix = if (side == "l") schema.lprefix else schema.rprefix
    val idCol = if (side == "l") schema.lid else schema.rid
    val attrs = pair0.columns.filter(c => c.startsWith(prefix) && c != idCol).toIndexedSeq
    val m = attrs.size
    require(m <= maxExactAttrs,
      s"exact coalition enumeration is 2^$m rows; raise maxExactAttrs or pre-select attributes")

    // predicted class → which score column the coalitions are valued in
    // (reference: shap_values(...)[idx], idx = argmax proba). The full
    // predicted row is collected so the pair re-binds as a
    // LocalRelation — the coalition cross-join below then never
    // re-plans the two source scans (r12).
    val orig = model.predict(pair0).head()
    val pc = if (orig.getAs[Double]("match_score") >
      orig.getAs[Double]("nomatch_score")) 1 else 0
    val scoreCol = if (pc == 1) "match_score" else "nomatch_score"
    val pair = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row.fromSeq(
        pair0.columns.toIndexedSeq.map(c => orig.get(orig.fieldIndex(c))))),
      pair0.schema)

    // one row per coalition bitmask; attribute j is "on" iff bit j set,
    // otherwise blanked to the off value
    val masks = spark.range(1L << m).withColumnRenamed("id", "__mask")
      .crossJoin(broadcast(pair))
    val masked = attrs.zipWithIndex.foldLeft(masks) { case (df, (a, j)) =>
      df.withColumn(a,
        when(shiftright(col("__mask"), j).cast("long").bitwiseAND(1L) === 1L, col(a))
          .otherwise(lit("")))
    }
    val scores = model.predict(masked)
      .select(col("__mask"), col(scoreCol).cast("double").as("__f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // exact Shapley: phi_j = Σ_{S ∌ j} |S|!(M-|S|-1)!/M! (f(S∪{j})−f(S))
    val fact = new Array[Double](m + 1)
    var f = 1.0
    for (i <- 0 to m) { fact(i) = f; f *= (i + 1) }
    val weight = Array.tabulate(m)(s => fact(s) * fact(m - s - 1) / fact(m))
    val phi = new Array[Double](m)
    var mask = 0L
    while (mask < (1L << m)) {
      val sSize = java.lang.Long.bitCount(mask)
      var j = 0
      while (j < m) {
        if ((mask >> j & 1L) == 0L) {
          phi(j) += weight(sSize) * (scores(mask | (1L << j)) - scores(mask))
        }
        j += 1
      }
      mask += 1
    }

    import spark.implicits._
    attrs.zip(phi.toIndexedSeq).toDF("attribute", "shap")
  }
}
