package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic group-capped sampling: "at most n rows per
  * (domain, lang, …)" — the mix-building primitive that complements
  * rate-based stratified sampling (`TextAnalysis.mixSample`, q53).
  * Rates thin uniformly; caps bound the contribution of any one
  * stratum, which is how over-represented domains get held down in a
  * training mix.
  *
  * Selection is a seeded md5 order within the group (portable: DuckDB
  * computes the identical hash, so the EXACT kept-row set is
  * oracle-checkable — the q53 portability rule), with the id as
  * tie-breaker. One hash-shuffle on the group key, per-group sort of
  * only each group's rows, no global sort.
  *
  * Scale note: a pathologically hot group routes all its rows to one
  * reducer before the cap applies (window partitioning is the group
  * key). When a single stratum is a significant fraction of the corpus,
  * pre-thin it with a rate gate (`mixSample`) sized to ~10n/|group|
  * first, or use [[Skew]]'s salted two-phase pattern; the cap's
  * semantics compose with either.
  */
object Sampling {

  /** Seeded portable per-row order key. */
  def hashOrder(idCol: Column, seed: Long): Column =
    md5(concat(idCol.cast("string"), lit("#" + seed)))

  /** Keep the `n` hash-smallest rows of every group. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], n: Int,
      idCol: String, seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(hashOrder(col(idCol), seed), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }
}
