package graft.perturb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-augmentation generators (reference local_explain.py:144-215
  * G1 generate_modified / generate_subsequences): for each string
  * attribute of each record and each token cut point, emit two variants
  * with the prefix / suffix dropped.
  *
  * The reference loops rows on the driver; here each attribute
  * contributes one Generator stage — explode over the cut-point
  * sequence × the {suffix-dropped, prefix-dropped} pair — so fan-out
  * (2·Σ(tokens-1) rows per record per attribute) happens executor-side.
  * Fresh ids are `offset + dense rank` over a deterministic ordering:
  * at true scale swap the global window for zipWithIndex, same contract.
  */
object Augment {

  /** G1 for one source table. `attrs` defaults to every non-id string
    * column. Output: same schema as `source`, only generated rows,
    * ids starting at `startId` (reference start_id = len(source)).
    */
  def generateSubsequences(source: DataFrame, startId: Long,
      attrs: Seq[String] = Nil): DataFrame = {
    val targetAttrs =
      if (attrs.nonEmpty) attrs
      else source.schema.fields
        .filter(f => f.name != "id" &&
          f.dataType == org.apache.spark.sql.types.StringType)
        .map(_.name).toSeq

    val perAttr = targetAttrs.map { a =>
      val toks = split(col(a), " ")
      // cut ∈ [1, nTokens-1]; variant 0 = drop prefix (keep toks[cut:]),
      // variant 1 = drop suffix (keep toks[:cut]) — local_explain.py:207-209
      val variants = flatten(transform(
        sequence(lit(1), size(toks) - 1),
        cut => array(
          array_join(slice(toks, cut + 1, size(toks) - cut), " "),
          array_join(slice(toks, lit(1), cut), " "))))
      source
        .filter(size(toks) >= 2)
        .withColumn("__newval", explode(variants))
        .withColumn(a, col("__newval"))
        .drop("__newval")
    }
    val generated = perAttr.reduceOption(_ unionByName _)
      .getOrElse(source.limit(0))
    // fresh deterministic ids
    val ordered = Window.orderBy(
      targetAttrs.map(col) :+ col("id").cast("string"): _*)
    generated
      .withColumn("id", lit(startId) + row_number().over(ordered).cast("long") - 1L)
  }

  /** G2 expand_copies (reference local_explain.py:237-302): the same
    * prefix/suffix perturbation applied to just the two probe records,
    * emitting synthetic source records with fresh ids. Operates on two
    * 1-row frames — the fan-out is tiny, but the same generator is
    * reused so semantics stay aligned.
    */
  def expandCopies(lRecord: DataFrame, rRecord: DataFrame,
      lStartId: Long, rStartId: Long): (DataFrame, DataFrame) = {
    val genLeft = generateSubsequences(lRecord, lStartId)
    val genRight = generateSubsequences(rRecord, rStartId)
    (genLeft, genRight)
  }
}
