package graft.baselines

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.matcher.ERModel
import graft.schema.PairSchema

/** Landmark baseline explainer, full per-token algorithm (reference
  * landmark.py:99-257): one side of the pair is held FIXED (the
  * "landmark"), the other side's text is perturbed token-by-token, and
  * a local linear surrogate maps per-token keep indicators to the match
  * score — yielding one impact per token (landmark.py
  * explanation_to_df: id, column, position, word, word_prefix, impact,
  * conf). The 'double' configuration first injects the landmark side's
  * non-overlapping tokens into the variable side
  * (add_before_perturbation, landmark.py:205-225), so perturbations can
  * both drop original tokens and adopt landmark tokens. `explain` with
  * conf='auto' runs matches as 'single' and non-matches as 'double',
  * both orientations each (landmark.py:40-97); eval.py:309 rolls the
  * result up per attribute with groupby('column').impact.sum().
  *
  * Spark-first: the reference round-trips LIME's string perturbations
  * through a positional token codec (Mapper) and a pandas rebuild per
  * sample batch. Here the (1-row) records localize once, every mask
  * sample is a row of one `range(numSamples)` plan whose kept-token
  * texts and keep indicators are codegen'd column expressions, and the
  * whole sample set is scored in ONE distributed model pass; only the
  * (numSamples × nTokens) design matrix flows into the MLlib fit.
  * Masks are deterministic (xxhash64), not RNG-driven.
  */
object Landmark {

  /** Per-token impacts for one orientation.
    *
    * @param variableSide "l": left record perturbed, right is the
    *                     landmark; "r" for the dual; "all": BOTH sides
    *                     perturbed together with no landmark — the
    *                     reference's plain-LIME configuration
    *                     (landmark.py:57-65, variable_side='all')
    * @param inject       add the landmark side's non-overlapping tokens
    *                     to the variable side before perturbation (the
    *                     'double' / "_injection" configuration; ignored
    *                     for "all" — there is no landmark to inject from)
    * @return (id, column, position, word, word_prefix, impact, conf)
    */
  def explainInstance(
      lRecord: DataFrame,
      rRecord: DataFrame,
      model: ERModel,
      variableSide: String = "l",
      inject: Boolean = false,
      numSamples: Int = 256,
      seed: Long = 42L,
      schema: PairSchema = PairSchema.default): DataFrame = {

    val spark = lRecord.sparkSession
    val lRow = lRecord.head()
    val rRow = rRecord.head()
    val attrs = lRecord.columns.filter(_ != "id")
      .intersect(rRecord.columns.filter(_ != "id")).toIndexedSeq
    def toks(row: org.apache.spark.sql.Row, a: String): IndexedSeq[String] =
      String.valueOf(row.getAs[Any](a)).trim.split("\\s+").toIndexedSeq

    // (row, prefix) of each perturbed side; its landmark twin when one
    // exists ("all" perturbs both sides, landmark-free)
    val varied: IndexedSeq[(org.apache.spark.sql.Row, String)] = variableSide match {
      case "l" => IndexedSeq((lRow, schema.lprefix))
      case "r" => IndexedSeq((rRow, schema.rprefix))
      case _ => IndexedSeq((lRow, schema.lprefix), (rRow, schema.rprefix))
    }
    val fixOpt: Option[(org.apache.spark.sql.Row, String)] = variableSide match {
      case "l" => Some((rRow, schema.rprefix))
      case "r" => Some((lRow, schema.lprefix))
      case _ => None
    }
    val recordId = String.valueOf(varied.head._1.getAs[Any]("id"))

    // token table of the perturbed side(s); under injection the
    // landmark's non-overlapping tokens append per attribute
    // (landmark.py compute_tokens/add_tokens with overlap=False), so
    // injected tokens sit at positions ≥ the original attribute length
    val tokenTable: IndexedSeq[(String, Int, String)] = varied.flatMap {
      case (varRow, varPrefix) => attrs.flatMap { a =>
        val own = toks(varRow, a)
        val injected = fixOpt match {
          case Some((fixRow, _)) if inject =>
            val inter = own.toSet.intersect(toks(fixRow, a).toSet)
            toks(fixRow, a).filterNot(inter)
          case _ => IndexedSeq.empty
        }
        (own ++ injected).zipWithIndex.map { case (w, p) => (varPrefix + a, p, w) }
      }
    }
    val n = tokenTable.size

    // keep token g of sample s iff hash(s, g, seed) is even — the same
    // predicate builds both the perturbed text and the design matrix
    def keep(g: Int) =
      pmod(xxhash64(col("__sample"), lit(g), lit(seed)), lit(2)) === 0

    val samples = spark.range(numSamples.toLong).withColumnRenamed("id", "__sample")
    val byAttr = tokenTable.zipWithIndex.groupBy(_._1._1)
    val varCols = varied.flatMap { case (_, varPrefix) =>
      attrs.map { a =>
        val entries = byAttr.getOrElse(varPrefix + a, IndexedSeq.empty)
        val kept = entries.map { case ((_, _, w), g) =>
          when(keep(g), lit(w)).otherwise(lit(null: String))
        }
        concat_ws(" ", kept: _*).as(varPrefix + a)
      }
    }
    val fixCols = fixOpt.toSeq.flatMap { case (fixRow, fixPrefix) =>
      attrs.map(a => lit(String.valueOf(fixRow.getAs[Any](a))).as(fixPrefix + a))
    }
    val idCols = Seq(
      lit(String.valueOf(lRow.getAs[Any]("id"))).as(schema.lid),
      lit(String.valueOf(rRow.getAs[Any]("id"))).as(schema.rid))
    val keepCols = (0 until n).map(g =>
      when(keep(g), 1.0).otherwise(0.0).as(s"__k_$g"))

    val pairs = samples.select(col("__sample") +: (idCols ++ varCols ++ fixCols): _*)
    // coalesce(1) as in Mojito: bit-deterministic surrogate fit under
    // any partition layout (the design frame is numSamples rows)
    val design = model.predict(pairs)
      .select(col("match_score").as("__y") +: keepCols: _*)
      .coalesce(1)

    val impacts: Array[Double] =
      if (n == 0) Array.empty
      else {
        val pipeline = new Pipeline().setStages(Array(
          new VectorAssembler().setInputCols((0 until n).map(g => s"__k_$g").toArray)
            .setOutputCol("features"),
          new LinearRegression().setLabelCol("__y").setFeaturesCol("features")
            .setMaxIter(100).setRegParam(0.001)))
        pipeline.fit(design).stages.last
          .asInstanceOf[LinearRegressionModel].coefficients.toArray
      }

    val conf = variableSide match {
      case "l" => "right_landmark" + (if (inject) "_injection" else "")
      case "r" => "left_landmark" + (if (inject) "_injection" else "")
      case _ => "LIME"
    }
    // Mapper letter codes: 'A' + column index over the perturbed
    // column list (left+right when variableSide is "all")
    val letter = varied.flatMap { case (_, p) => attrs.map(p + _) }
      .zipWithIndex.map { case (c, i) => c -> ('A' + i).toChar }.toMap
    import spark.implicits._
    tokenTable.zip(impacts.toIndexedSeq).map { case ((column, pos, w), imp) =>
      (recordId, column, pos, w, f"${letter(column)}$pos%02d_$w", imp, conf)
    }.toDF("id", "column", "position", "word", "word_prefix", "impact", "conf")
  }

  /** Both orientations (right landmark then left, landmark.py:75-96).
    * conf='auto' semantics: matched pairs explain as 'single' (no
    * injection), non-matches as 'double' (injection) — landmark.py:50-55.
    */
  def explainAuto(
      lRecord: DataFrame,
      rRecord: DataFrame,
      model: ERModel,
      label: Int,
      numSamples: Int = 256,
      seed: Long = 42L,
      schema: PairSchema = PairSchema.default): DataFrame = {
    val inject = label == 0
    explainInstance(lRecord, rRecord, model, "l", inject, numSamples, seed, schema)
      .unionByName(
        explainInstance(lRecord, rRecord, model, "r", inject, numSamples, seed, schema))
  }

  /** eval.py:309 rollup: per-attribute impact sums. coalesce(1) keeps
    * the FP sum in row order (the per-token frame is a driver-local
    * relation with deterministic order) — bit-stable across sessions.
    */
  def attributeImpacts(perToken: DataFrame): DataFrame =
    perToken.coalesce(1).groupBy(col("column").as("attribute"))
      .agg(sum(col("impact")).as("weight"))

  /** Attribute-level façade (the EvalDriver surface): full per-token
    * Landmark for the given orientation, rolled up per attribute.
    */
  def explain(
      lRecord: DataFrame,
      rRecord: DataFrame,
      model: ERModel,
      side: String = "l",
      numSamples: Int = 256,
      seed: Long = 42L,
      schema: PairSchema = PairSchema.default): DataFrame =
    attributeImpacts(explainInstance(
      lRecord, rRecord, model, side, inject = false, numSamples, seed, schema))
}
