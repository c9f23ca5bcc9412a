package graft.matcher

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{LogisticRegression, MultilayerPerceptronClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextSim
import graft.schema.PairSchema

/** Trainable ER matcher: an MLlib pipeline over pair-similarity
  * features — the JVM-pure, cluster-scalable replacement for the
  * reference's three neural wrappers (SURVEY.md §2.9: DeepMatcher
  * dm.py, DeepER.py, bert.py all reduce to "batch pair scorer");
  * external models plug in behind the same ERModel trait via
  * mapPartitions ONNX scoring (documented, not built — no runtime here).
  *
  * Features per attribute: token-bag cosine, token-jaccard, plus
  * length-difference ratio — computed as columns (codegen where
  * built-in), assembled, fed to seeded LogisticRegression. `transform`
  * appends probability → match_score/nomatch_score, preserving the
  * reference's score contract (models/utils.py:12-67 lifecycle).
  */
final class MLlibMatcher private (
    val model: PipelineModel,
    schema: PairSchema) extends ERModel {

  // pipeline transform (feature assembly + model) outweighs a
  // candidate-pruning sketch pass
  override def costlyScorer: Boolean = true

  override def predict(pairs: DataFrame): DataFrame = {
    val feat = MLlibMatcher.withFeatures(pairs, schema)
    val scored = model.transform(feat)
    val probs = vector_to_array(col("probability"))
    scored
      .withColumn("nomatch_score", element_at(probs, 1))
      .withColumn("match_score", element_at(probs, 2))
      .drop("features", "rawPrediction", "probability", "prediction")
      .drop(MLlibMatcher.featureCols(pairs, schema): _*)
  }

  def save(path: String): Unit = model.write.overwrite().save(path)
}

object MLlibMatcher {

  private[matcher] def attrPairs(df: DataFrame, schema: PairSchema): Seq[(String, String)] = {
    val l = df.columns.filter(c => c.startsWith(schema.lprefix) && c != schema.lid)
      .map(_.stripPrefix(schema.lprefix)).toSet
    val r = df.columns.filter(c => c.startsWith(schema.rprefix) && c != schema.rid)
      .map(_.stripPrefix(schema.rprefix)).toSet
    (l intersect r).toSeq.sorted
      .map(a => (schema.lprefix + a, schema.rprefix + a))
  }

  private[matcher] def featureCols(df: DataFrame, schema: PairSchema): Seq[String] =
    attrPairs(df, schema).flatMap { case (l, _) =>
      val a = l.stripPrefix(schema.lprefix)
      Seq(s"__cos_$a", s"__jac_$a", s"__len_$a")
    }

  private[matcher] def withFeatures(df: DataFrame, schema: PairSchema): DataFrame =
    attrPairs(df, schema).foldLeft(df) { case (d, (l, r)) =>
      val a = l.stripPrefix(schema.lprefix)
      val lt = coalesce(col(l).cast("string"), lit(""))
      val rt = coalesce(col(r).cast("string"), lit(""))
      val ltoks = array_distinct(split(lt, " "))
      val rtoks = array_distinct(split(rt, " "))
      val inter = size(array_intersect(ltoks, rtoks))
      // |A∪B| = |A|+|B|−|A∩B| (both sides distinct): same integer count
      // without the per-pair union set build
      val uni = size(ltoks) + size(rtoks) - inter
      d.withColumn(s"__cos_$a", TextSim.tokenCosine(lt, rt))
        .withColumn(s"__jac_$a",
          when(uni === 0, 0.0)
            .otherwise(inter.cast("double") / uni))
        .withColumn(s"__len_$a",
          when(greatest(length(lt), length(rt)) === 0, 0.0)
            .otherwise(abs(length(lt) - length(rt)).cast("double") /
              greatest(length(lt), length(rt))))
    }

  /** Train on a labeled pair frame (`label` 0/1). Deterministic: LBFGS
    * logistic regression, fixed feature order.
    */
  def train(labeledPairs: DataFrame,
      schema: PairSchema = PairSchema.default): MLlibMatcher = {
    val feat = withFeatures(labeledPairs, schema)
      .withColumn("label", col("label").cast("double"))
    val assembler = new VectorAssembler()
      .setInputCols(featureCols(labeledPairs, schema).toArray)
      .setOutputCol("features")
    val lr = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setLabelCol("label")
    val pipeline = new Pipeline().setStages(Array(assembler, lr))
    new MLlibMatcher(pipeline.fit(feat), schema)
  }

  /** Train a feed-forward NEURAL matcher (MLlib
    * MultilayerPerceptronClassifier) over the same pair-similarity
    * features: the in-container stand-in for the reference's torch
    * wrappers (dm.py / DeepER.py / bert.py — SURVEY §2.9), which all
    * reduce to "batch pair scorer" behind [[ERModel]]. Scoring is a
    * distributed `transform` (matrix-vector per row, no driver loop),
    * so the explainer stack — including [[graft.candidates.
    * LshBlockingGenerator]]'s expensive-scorer rationale — runs
    * unchanged against a genuinely non-linear model. Seeded + L-BFGS:
    * deterministic for the golden/eval fixtures.
    *
    * @param hidden hidden-layer widths; the full topology is
    *               [numFeatures, hidden..., 2]
    */
  def trainMlp(labeledPairs: DataFrame, hidden: Seq[Int] = Seq(8, 4),
      seed: Long = 42L,
      schema: PairSchema = PairSchema.default): MLlibMatcher = {
    val cols = featureCols(labeledPairs, schema)
    val feat = withFeatures(labeledPairs, schema)
      .withColumn("label", col("label").cast("double"))
    val assembler = new VectorAssembler()
      .setInputCols(cols.toArray)
      .setOutputCol("features")
    val mlp = new MultilayerPerceptronClassifier()
      .setLayers((cols.size +: hidden :+ 2).toArray)
      .setSeed(seed).setMaxIter(200).setSolver("l-bfgs")
      .setLabelCol("label")
    val pipeline = new Pipeline().setStages(Array(assembler, mlp))
    new MLlibMatcher(pipeline.fit(feat), schema)
  }

  /** Load-else-train lifecycle (reference models/utils.py:23-67
    * get_model). The "no saved model yet" case is detected with a
    * filesystem check, not by letting `PipelineModel.load` throw —
    * MLlib's Instrumentation logs every load failure as an ERROR stack
    * trace, which buries real failures in the expected first-run path.
    */
  def loadOrTrain(path: String, labeledPairs: => DataFrame,
      schema: PairSchema = PairSchema.default): MLlibMatcher = {
    val saved = try {
      val p = new org.apache.hadoop.fs.Path(path, "metadata")
      p.getFileSystem(org.apache.spark.sql.SparkSession.active
        .sessionState.newHadoopConf()).exists(p)
    } catch { case _: Exception => false }
    val loaded =
      if (saved)
        try Some(new MLlibMatcher(PipelineModel.load(path), schema))
        catch { case _: Exception => None } // corrupt save → retrain
      else None
    loaded.getOrElse {
      val m = train(labeledPairs, schema)
      m.save(path)
      m
    }
  }
}
