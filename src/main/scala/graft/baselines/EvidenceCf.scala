package graft.baselines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.matcher.ERModel
import graft.schema.PairSchema

/** Evidence-counterfactual result (the dict of reference
  * shap_c.py:192-197 / lime_c.py:200-204, typed).
  *
  * @param explanationSet   attributes blanked in the counterfactual
  * @param coefficients     their importance weights, same order
  * @param nActive          number of candidate attributes
  * @param originalScore    predicted-class score before blanking
  * @param newScore         predicted-class score of the counterfactual
  * @param cfExample        the blanked pair row (empty frame when no
  *                         counterfactual was found, as the reference
  *                         returns an empty DataFrame)
  */
final case class EvidenceCfResult(
    explanationSet: Seq[String],
    coefficients: Seq[Double],
    nActive: Int,
    originalScore: Double,
    newScore: Double,
    cfExample: DataFrame) {
  def found: Boolean = explanationSet.nonEmpty
  def sizeExplanation: Int = explanationSet.size
  def relativeSize: Double =
    if (nActive == 0) 0.0 else sizeExplanation.toDouble / nActive
}

/** The greedy evidence-counterfactual search shared by SHAP-C and
  * LIME-C (reference shap_c.py:141-190, lime_c.py:146-188): blank the
  * top-L ranked supporting attributes for growing L until the
  * predicted-class score drops below the threshold.
  *
  * The reference re-scores one prefix per loop iteration; each
  * iteration rebuilds its perturbed instance from scratch, so the loop
  * is stateless across L — which means every prefix candidate can be
  * generated and scored in ONE distributed model pass, and the driver
  * just picks the smallest qualifying L. Same fixpoint, one job
  * instead of ≤ maxFeatures sequential ones.
  */
object EvidenceCf {

  /** @param ranked   (attribute, weight) in blanking priority order
    * @param eligible which ranked entries may be blanked (the sign rule
    *                 differs between SHAP-C and LIME-C)
    */
  def search(
      lRecord: DataFrame,
      rRecord: DataFrame,
      model: ERModel,
      ranked: Seq[(String, Double)],
      eligible: ((String, Double)) => Boolean,
      threshold: Double = 0.5,
      maxFeatures: Int = 30,
      schema: PairSchema = PairSchema.default): EvidenceCfResult = {

    val spark = lRecord.sparkSession
    val pair0 = schema.assemblePair(lRecord, rRecord)

    // full predicted row collected once (r12): the scores drive pc, and
    // the pair row itself re-binds as a LocalRelation so the prefix
    // cross-join below never re-plans the two source scans
    val orig = model.predict(pair0).head()
    val pc = if (orig.getAs[Double]("match_score") >
      orig.getAs[Double]("nomatch_score")) 1 else 0
    val scoreCol = if (pc == 1) "match_score" else "nomatch_score"
    val originalScore = orig.getAs[Double](scoreCol)
    val pair = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row.fromSeq(
        pair0.columns.toIndexedSeq.map(c => orig.get(orig.fieldIndex(c))))),
      pair0.schema)

    // prefix L → the attributes actually blanked (eligible ∩ top-L)
    val maxL = math.min(ranked.size, maxFeatures)
    val blankSets: IndexedSeq[Seq[(String, Double)]] =
      (1 to maxL).map(l => ranked.take(l).filter(eligible))

    if (blankSets.isEmpty || blankSets.last.isEmpty)
      return EvidenceCfResult(Nil, Nil, ranked.size, originalScore, originalScore,
        spark.emptyDataFrame)

    // all prefix candidates in one frame, scored in one pass
    val candidates = spark.range(1L, maxL + 1L).withColumnRenamed("id", "__L")
      .crossJoin(broadcast(pair))
    val blankAttrSets = blankSets.map(_.map(_._1).toSet)
    val blanked = ranked.map(_._1).distinct.foldLeft(candidates) { (df, a) =>
      val blankAtL = blankAttrSets.zipWithIndex.collect {
        case (s, i) if s.contains(a) => (i + 1).toLong
      }
      if (blankAtL.isEmpty) df
      else df.withColumn(a,
        when(col("__L").isin(blankAtL: _*), lit("")).otherwise(col(a)))
    }
    val scored = model.predict(blanked)
    // ONE collect of the full scored rows (r12): byL AND the chosen
    // counterfactual row both fall out of it — the old cf path
    // re-executed the whole blanked predict pass for the one row it
    // kept (the frame was uncached by design; nothing may stay pinned
    // across EvalDriver's per-pair loop).
    val scoredRows = scored.collect()
    val lFieldIdx = scored.schema.fieldIndex("__L")
    val sFieldIdx = scored.schema.fieldIndex(scoreCol)
    val byL = scoredRows
      .map(r => r.getLong(lFieldIdx) -> r.getDouble(sFieldIdx)).toMap

    (1 to maxL).find(l => byL(l.toLong) < threshold) match {
      case Some(l) =>
        val set = blankSets(l - 1)
        val keepIdxs = scored.schema.indices.filter(_ != lFieldIdx)
        val cfRows = scoredRows.filter(_.getLong(lFieldIdx) == l.toLong)
          .map(r => org.apache.spark.sql.Row.fromSeq(keepIdxs.map(r.get)))
        val cfSchema = org.apache.spark.sql.types.StructType(
          keepIdxs.map(scored.schema.fields))
        val cfLocal = spark.createDataFrame(
          java.util.Arrays.asList(cfRows.toIndexedSeq: _*), cfSchema)
        EvidenceCfResult(set.map(_._1), set.map(_._2), ranked.size,
          originalScore, byL(l.toLong), cfLocal)
      case None =>
        EvidenceCfResult(Nil, Nil, ranked.size, originalScore,
          byL.getOrElse(maxL.toLong, originalScore), spark.emptyDataFrame)
    }
  }
}

/** SHAP-C (reference baselines/shap_c.py:1-197): exact-Shapley
  * attributions ranked by |value|, greedy blanking of the
  * positive-attribution prefix until the prediction flips.
  */
object ShapC {
  def explain(
      lRecord: DataFrame,
      rRecord: DataFrame,
      model: ERModel,
      side: String = "l",
      threshold: Double = 0.5,
      maxFeatures: Int = 30,
      schema: PairSchema = PairSchema.default): EvidenceCfResult = {
    val shap = Shap.attributions(lRecord, rRecord, model, side, schema = schema)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // sort by decreasing |shap| (shap_c.py:134-139); blank only features
    // whose attribution supports the predicted class (shap_c.py:159)
    val ranked = shap.sortBy { case (a, v) => (-math.abs(v), a) }
    EvidenceCf.search(lRecord, rRecord, model, ranked,
      eligible = _._2 >= 0, threshold, maxFeatures, schema)
  }
}

/** LIME-C (reference baselines/lime_c.py:1-246): Mojito/LIME attribute
  * weights as the ranking, greedy blanking of the supporting-sign
  * prefix until the prediction flips.
  */
object LimeC {
  def explain(
      lRecord: DataFrame,
      rRecord: DataFrame,
      model: ERModel,
      side: String = "l",
      numSamples: Int = 100,
      threshold: Double = 0.5,
      maxFeatures: Int = 30,
      seed: Long = 42L,
      schema: PairSchema = PairSchema.default): EvidenceCfResult = {
    val pair = schema.assemblePair(lRecord, rRecord)
    val orig = model.predict(pair)
      .select(col("nomatch_score"), col("match_score")).head()
    val pc = if (orig.getDouble(1) > orig.getDouble(0)) 1 else 0

    val weights = Mojito.explain(lRecord, rRecord, model, side, numSamples,
        seed, schema)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // lime_c.py:133: descending for predicted class 1, ascending for 0;
    // lime_c.py:158: blank only weights whose sign supports the class
    val ranked =
      if (pc == 1) weights.sortBy { case (a, w) => (-w, a) }
      else weights.sortBy { case (a, w) => (w, a) }
    val eligible: ((String, Double)) => Boolean =
      if (pc == 1) _._2 > 0 else _._2 < 0
    EvidenceCf.search(lRecord, rRecord, model, ranked, eligible,
      threshold, maxFeatures, schema)
  }
}
