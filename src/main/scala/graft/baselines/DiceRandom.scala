package graft.baselines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.matcher.ERModel
import graft.schema.PairSchema

/** DiCE-style random counterfactual generation (the reference drives
  * dice_ml.Dice(method='random') over the pair frame, eval.py:142-161):
  * sample random feature subsets, replace each chosen attribute with a
  * random value from its dataset domain, keep the first `totalCFs`
  * candidates whose prediction flips to the opposite class.
  *
  * Spark-first: attribute domains come from one distinct-aggregation
  * per attribute (hash-ordered, capped — at corpus scale a domain
  * sample, never a full collect of a high-cardinality column), the
  * candidate batch is a single `range(numSamples)` plan with
  * hash-driven feature choices (deterministic, no RNG), and every
  * candidate scores in ONE distributed model pass.
  */
object DiceRandom {

  /** @param dataset  pair frame supplying per-attribute value domains
    *                  (the reference passes the test pair table)
    * @return up to `totalCFs` counterfactual pair rows ⊕ scores,
    *         deterministically ordered by sample index
    */
  def explain(
      lRecord: DataFrame,
      rRecord: DataFrame,
      model: ERModel,
      dataset: DataFrame,
      totalCFs: Int = 10,
      numSamples: Int = 500,
      maxDomain: Int = 100,
      seed: Long = 42L,
      schema: PairSchema = PairSchema.default): DataFrame = {

    val spark = lRecord.sparkSession
    val pair0 = schema.assemblePair(lRecord, rRecord)
    val attrs = schema.pairAttributes(dataset)
      .filter(pair0.columns.contains).toIndexedSeq

    // full predicted row collected once; the pair re-binds as a
    // LocalRelation so the sample cross-join below never re-plans the
    // two source scans (r12)
    val orig = model.predict(pair0).head()
    val pc = if (orig.getAs[Double]("match_score") >
      orig.getAs[Double]("nomatch_score")) 1 else 0
    val classScoreCol = if (pc == 1) "match_score" else "nomatch_score"
    val pair = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row.fromSeq(
        pair0.columns.toIndexedSeq.map(c => orig.get(orig.fieldIndex(c))))),
      pair0.schema)

    // bounded, deterministic domain sample per attribute — ALL
    // attributes in ONE job: unpivot to (attr, v), distinct, rank
    // within each attribute by the same (hash, value) order the
    // per-attribute orderBy+limit used, keep rank ≤ maxDomain. One JOB
    // (N union branches each scanning `dataset` — not one scan) + one
    // window shuffle replaces one full job per attribute (the domains
    // dominated this explainer's job count).
    val domains: Map[String, IndexedSeq[String]] = {
      val stacked = attrs.map { a =>
        dataset.select(lit(a).as("__a"), col(a).cast("string").as("v"))
      }.reduce(_ unionByName _).filter(col("v").isNotNull).distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__a")).orderBy(xxhash64(col("v"), lit(seed)), col("v"))
      val ranked = stacked.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= maxDomain)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      val byAttr = ranked.groupBy(_._1)
      attrs.map(a => a -> byAttr.getOrElse(a, Array.empty)
        .sortBy(_._3).map(_._2).toIndexedSeq).toMap
    }

    // candidate s alters attribute a iff hash(s,a) ≡ 0 (mod 4) — a ~25%
    // feature-subset draw; the replacement indexes the domain by an
    // independent hash
    val samples = spark.range(numSamples.toLong).withColumnRenamed("id", "__sample")
      .crossJoin(broadcast(pair))
    val perturbed = attrs.foldLeft(samples) { (df, a) =>
      val dom = domains(a)
      if (dom.isEmpty) df
      else {
        val alter = pmod(xxhash64(col("__sample"), lit(a), lit(seed)), lit(4)) === 0
        val pick = element_at(typedLit(dom),
          (pmod(xxhash64(col("__sample"), lit(a), lit(seed + 1)), lit(dom.size)) + 1)
            .cast("int"))
        df.withColumn(a, when(alter, pick).otherwise(col(a)))
      }
    }

    model.predict(perturbed)
      .filter(col(classScoreCol) < 0.5) // desired_class = "opposite"
      .orderBy(col("__sample"))
      .limit(totalCFs)
      .drop("__sample")
  }
}
