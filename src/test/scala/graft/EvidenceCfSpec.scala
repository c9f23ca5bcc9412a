package graft

import graft.baselines.{DiceRandom, LimeC, Mojito, Shap, ShapC}
import graft.matcher.TokenCosineModel
import graft.metrics.CfMetrics
import org.apache.spark.sql.functions.col

/** SHAP-C / LIME-C evidence-counterfactual baselines (reference
  * baselines/shap_c.py, lime_c.py, driven by eval.py:113-140).
  */
class EvidenceCfSpec extends SparkSpec {

  import spark.implicits._

  private def lRec = Seq((0L, "alpha beta gamma delta", "xx yy"))
    .toDF("id", "name", "city")
  private def rRec = Seq((0L, "alpha beta gamma delta", "zz ww"))
    .toDF("id", "name", "city")

  test("exact Shapley attributions: efficiency and Mojito-consistent ranking") {
    val model = TokenCosineModel()
    val shap = Shap.attributions(lRec, rRec, model, side = "l")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // efficiency: Σ phi = f(full) − f(all-blanked); compute both ends
    val schema = graft.schema.PairSchema.default
    val pair = schema.assemblePair(lRec, rRec)
    val full = model.predict(pair).select(col("match_score")).head().getDouble(0)
    val blankedPair = pair
      .withColumn("ltable_name", org.apache.spark.sql.functions.lit(""))
      .withColumn("ltable_city", org.apache.spark.sql.functions.lit(""))
    val empty = model.predict(blankedPair).select(col("match_score")).head().getDouble(0)
    assert(math.abs(shap.values.sum - (full - empty)) < 1e-9)

    // the match-carrying attribute dominates, agreeing with Mojito's
    // ranking on the same fixture (the comparison eval.py performs)
    assert(shap("ltable_name") > shap("ltable_city"))
    val mojito = Mojito.explain(lRec, rRec, model, side = "l", numSamples = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(mojito.maxBy(_._2)._1 === shap.maxBy(_._2)._1)
  }

  test("SHAP-C finds a valid counterfactual on a matched pair") {
    val res = ShapC.explain(lRec, rRec, TokenCosineModel())
    assert(res.found)
    // blanking the name is what flips a cosine match
    assert(res.explanationSet.contains("ltable_name"))
    assert(res.originalScore >= 0.5 && res.newScore < 0.5)
    assert(res.sizeExplanation <= res.nActive)
    assert(CfMetrics.validity(res.cfExample, "match_score") === 1.0)
  }

  test("LIME-C counterfactual is valid on the fixture model") {
    val res = LimeC.explain(lRec, rRec, TokenCosineModel(), numSamples = 64)
    assert(res.found)
    assert(res.newScore < 0.5)
    assert(CfMetrics.validity(res.cfExample, "match_score") > 0.0)
    assert(res.relativeSize > 0.0 && res.relativeSize <= 1.0)
  }

  test("DiCE-random counterfactuals flip the class, bounded and deterministic") {
    val model = TokenCosineModel()
    val dataset = graft.schema.PairSchema.default.mergeSources(
      Seq((0L, 0L, 1), (1L, 1L, 0)).toDF("ltable_id", "rtable_id", "label"),
      Seq((0L, "alpha beta gamma delta", "xx yy"),
        (1L, "omega psi chi phi", "pp qq")).toDF("id", "name", "city"),
      Seq((0L, "alpha beta gamma delta", "zz ww"),
        (1L, "rho sigma tau upsilon", "rr ss")).toDF("id", "name", "city"))
    val cfs = DiceRandom.explain(lRec, rRec, model, dataset, totalCFs = 5,
      numSamples = 200)
    val rows = cfs.collect()
    assert(rows.length <= 5)
    assert(rows.nonEmpty) // the domain contains disjoint names → flips exist
    // every CF flips the predicted (match) class
    rows.foreach(r => assert(r.getAs[Double]("match_score") < 0.5))
    // deterministic: same inputs → same counterfactuals
    val again = DiceRandom.explain(lRec, rRec, model, dataset, totalCFs = 5,
      numSamples = 200).collect()
    assert(again.map(_.toString).toSeq === rows.map(_.toString).toSeq)
  }

  test("no counterfactual → empty result, original score preserved") {
    // disjoint pair: predicted class is nomatch; blanking cannot push
    // nomatch_score below 0.5 for a cosine model (it only rises), so the
    // search must come back empty-handed like the reference's NaN branch
    val l = Seq((0L, "aa bb", "cc")).toDF("id", "name", "city")
    val r = Seq((0L, "dd ee", "ff")).toDF("id", "name", "city")
    val res = ShapC.explain(l, r, TokenCosineModel())
    assert(!res.found)
    assert(res.cfExample.columns.isEmpty)
  }
}
