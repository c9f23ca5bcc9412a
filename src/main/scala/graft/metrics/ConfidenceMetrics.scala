package graft.metrics

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{MinMaxScaler, VectorAssembler}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A14 confidence indication (reference metrics/saliency.py:16-135):
  * how well saliency scores predict the model's confidence — a linear
  * regression from per-attribute saliency features to the prediction
  * confidence, cross-validated, reported as mean/max absolute error.
  *
  * The reference uses sklearn ShuffleSplit + LinearRegression; here a
  * deterministic hash-based fold assignment + MLlib pipeline
  * (MinMaxScaler + LinearRegression), one distributed fit/score per
  * fold.
  */
object ConfidenceMetrics {

  final case class ConfidenceResult(meanMae: Double, maxError: Double,
      foldMaes: Seq[Double])

  /** @param explanations one row per explained pair: per-attribute
    *                     saliency columns (`featureCols`) + a
    *                     `confidence` column (predicted-class score)
    * @param foldCols columns hashed into the deterministic fold
    *                  assignment; defaults to `featureCols`, but when
    *                  feature tuples repeat heavily (few distinct
    *                  saliency profiles) that can leave folds empty —
    *                  pass the pair-id columns for balanced row-level
    *                  folds (the reference's ShuffleSplit semantics).
    */
  def confidenceIndication(
      explanations: DataFrame,
      featureCols: Seq[String],
      nFolds: Int = 5,
      seed: Long = 42L,
      foldCols: Seq[String] = Nil): ConfidenceResult = {

    val fc = if (foldCols.isEmpty) featureCols else foldCols
    val withFold = explanations.withColumn("__fold",
      pmod(xxhash64(fc.map(col) :+ lit(seed): _*), lit(nFolds)))
      .cache()
    try {
      val maes = (0 until nFolds).map { f =>
        val train = withFold.filter(col("__fold") =!= f)
        val test = withFold.filter(col("__fold") === f)
        if (train.isEmpty || test.isEmpty) 0.0
        else {
          val pipeline = new Pipeline().setStages(Array(
            new VectorAssembler().setInputCols(featureCols.toArray)
              .setOutputCol("__raw"),
            new MinMaxScaler().setInputCol("__raw").setOutputCol("features"),
            new LinearRegression().setLabelCol("confidence")
              .setFeaturesCol("features").setMaxIter(100)))
          val model = pipeline.fit(train)
          model.transform(test)
            .agg(avg(abs(col("prediction") - col("confidence"))))
            .head().getDouble(0)
        }
      }
      val maxErr = maes.max
      ConfidenceResult(maes.sum / maes.size, maxErr, maes)
    } finally withFold.unpersist()
  }
}
