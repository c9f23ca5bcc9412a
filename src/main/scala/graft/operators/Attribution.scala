package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution (position-based / U-shaped): each
  * converting user's pre-conversion touches share the conversion
  * credit in integer BASIS POINTS — 40% to the first touch, 40% to
  * the last, 20% floor-split across the middles with the remainder
  * going to the EARLIEST middles, so every journey's credit sums to
  * EXACTLY 10000 (the invariant the spec pins; float credit schemes
  * can't make that guarantee, and an integer one is engine-portable).
  * A single-touch journey takes all 10000; a 2-touch journey
  * degenerates to 50/50 (5000 each — there is no middle pool to
  * distribute, so the standard U-shape folds the 20% back into the
  * endpoints).
  *
  * Scale shape: one user-keyed shuffle carries the first-conversion
  * argmin (a pure aggregate — min over a (ts, id) struct), the touch
  * ranking, and the journey length; the credit formula is scan-local
  * CASE arithmetic. Nothing collects; the census that usually follows
  * is one more map-side-combined shuffle on the channel key.
  */
object Attribution {

  /** Per-touch credit rows: input columns + `r` (1-based touch rank),
    * `n` (journey length), `credit_bp`. Touches are the non-`convType`
    * events strictly before the user's FIRST `convType` event in
    * (`usCol`, `idCol`) order; non-converting users drop out.
    */
  def uShapedCredit(df: DataFrame, userCol: String, idCol: String,
      typeCol: String, usCol: String,
      convType: String = "purchase"): DataFrame = {
    val conv = df.filter(col(typeCol) === convType)
      .groupBy(col(userCol))
      .agg(min(struct(col(usCol), col(idCol))).as("__c"))
      .select(col(userCol), col(s"__c.$usCol").as("__c_us"),
        col(s"__c.$idCol").as("__c_id"))
    val touches = df.filter(col(typeCol) =!= convType)
      .join(conv, Seq(userCol))
      .filter(col(usCol) < col("__c_us") ||
        (col(usCol) === col("__c_us") && col(idCol) < col("__c_id")))
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(usCol), col(idCol))
    val credit =
      when(col("n") === 1, lit(10000L))
        .when(col("n") === 2, lit(5000L))
        .when(col("r") === 1 || col("r") === col("n"), lit(4000L))
        .otherwise(expr("2000 div (n - 2)")
          + when(col("r") - 2 < expr("2000 % (n - 2)"), 1L).otherwise(0L))
    touches
      .withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(userCol))))
      .withColumn("credit_bp", credit.cast("long"))
      .drop("__c_us", "__c_id")
  }
}
