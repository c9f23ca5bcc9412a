package graft.baselines

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.matcher.ERModel
import graft.schema.PairSchema

/** LIME-style baseline explainer (reference mojito.py G4 / lime_c
  * "attribute-mask" variant): sample token-drop masks of the perturbed
  * side, score every perturbed pair with the matcher, and fit a local
  * linear surrogate from per-attribute keep-fractions to the match
  * score; the coefficients are the attribute impacts (the
  * `groupby('attribute').weight.mean()` rollup of eval.py:280-289 folded
  * into the feature design).
  *
  * Spark-first: the mask sample is one `range(numSamples)` crossJoin —
  * every perturbation row is generated and scored executor-side in a
  * single plan; only the tiny (numSamples × attrs) design matrix flows
  * into the MLlib fit. Deterministic: masks come from xxhash64(sample,
  * attr, token, seed), not an RNG.
  */
object Mojito {

  /** @param side "l" to perturb the left record, "r" the right
    * @return one row per perturbed-side attribute: (attribute, weight)
    */
  def explain(
      lRecord: DataFrame,
      rRecord: DataFrame,
      model: ERModel,
      side: String = "l",
      numSamples: Int = 100,
      seed: Long = 42L,
      schema: PairSchema = PairSchema.default): DataFrame = {

    val spark = lRecord.sparkSession
    val pair = schema.assemblePair(lRecord, rRecord)
    val prefix = if (side == "l") schema.lprefix else schema.rprefix
    val idCol = if (side == "l") schema.lid else schema.rid
    val attrs = pair.columns.filter(c => c.startsWith(prefix) && c != idCol).toIndexedSeq

    // one row per mask sample; the single pair row joins onto each
    val samples = spark.range(numSamples.toLong).withColumnRenamed("id", "__sample")
      .crossJoin(broadcast(pair))

    // per attribute: keep token i of sample s iff hash(s, attr, i) is even
    val masked = attrs.foldLeft(samples) { (df, a) =>
      val toks = split(coalesce(col(a).cast("string"), lit("")), " ")
      val kept = filter(toks, (t, i) =>
        pmod(xxhash64(col("__sample"), lit(a), i, lit(seed)), lit(2)) === 0)
      df.withColumn(a, array_join(kept, " "))
        .withColumn(s"__keep_$a",
          when(size(toks) === 0, 1.0)
            .otherwise(size(kept).cast("double") / size(toks).cast("double")))
    }

    // single partition before the fit: the surrogate's gram-matrix
    // accumulation then runs in row order (range order — deterministic)
    // instead of partition-merge order, so the coefficients are
    // bit-identical under any session parallelism — required for the
    // frozen-golden oracle. The frame is numSamples × attrs tiny.
    val scored = model.predict(masked)
      .select(col("__sample") +: col("match_score").as("__y") +:
        attrs.map(a => col(s"__keep_$a")): _*)
      .coalesce(1)

    val pipeline = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(attrs.map(a => s"__keep_$a").toArray)
        .setOutputCol("features"),
      new LinearRegression().setLabelCol("__y").setFeaturesCol("features")
        .setMaxIter(100).setRegParam(0.001)))
    val fitted = pipeline.fit(scored)
    val coefs = fitted.stages.last
      .asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
      .coefficients.toArray

    import spark.implicits._
    attrs.zip(coefs).toDF("attribute", "weight")
  }
}
