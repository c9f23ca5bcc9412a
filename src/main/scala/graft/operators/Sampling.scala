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

  /** Deterministic FRACTIONAL upsampling — the other half of mix
    * building (rates thin, caps bound, weights > 1 repeat): every row
    * emits `floor(w)` copies plus one more when its seeded hash gate
    * falls under `frac(w)`, so a 2.5-weighted stratum lands at exactly
    * 2.5× in expectation with a reproducible, engine-portable copy set
    * (the q53 md5-gate rule — no `rand()`). Weights below 1 thin
    * (0 copies when the gate misses); strata absent from `weights`
    * pass through at 1×. `copy_idx` (1-based) disambiguates the
    * repeats downstream (e.g. for epoch-aware shuffling).
    *
    * Scale: copy generation is a scan-local explode — rows multiply at
    * the scan, nothing shuffles. Use binary-exact fractional parts
    * (.5, .25, .125 …) so the gate threshold compares identically in
    * every engine.
    */
  def upsampleByWeight(df: DataFrame, stratumCol: String, keyCol: String,
      weights: Map[String, Double], seed: Long = 42L): DataFrame = {
    val w = weights.foldLeft(lit(1.0)) { case (acc, (stratum, v)) =>
      when(col(stratumCol) === stratum, lit(v)).otherwise(acc)
    }
    val gate = pmod(graft.dedup.Dedup.portableHash60(
      concat(col(keyCol).cast("string"), lit("#up" + seed))), lit(10000L))
    val copies = (floor(w)
      + when(gate < (w - floor(w)) * 10000.0, 1L).otherwise(0L)).cast("int")
    // sequence(1, 0) would COUNT DOWN in Spark — guard the empty case
    df.withColumn("copy_idx",
      explode(when(copies >= 1, sequence(lit(1), copies))
        .otherwise(array().cast("array<int>"))))
  }

  /** EXACT-total stratified sampling by the LARGEST-REMAINDER
    * (Hamilton) apportionment: exactly `totalK` rows overall, each
    * stratum's share proportional to its size — `floor(n_s·K/N)` seats
    * plus one bonus seat to the largest remainders (ties to the
    * lexicographically smaller stratum) — the eval-set construction
    * rule when "exactly K examples, proportionally stratified" is the
    * contract (per-stratum rates can't hit an exact total; per-stratum
    * caps can't apportion one). Within a stratum rows are picked by
    * the q132 reservoir rule: smallest (seeded portable hash, id).
    *
    * Scale shape: the strata census collects at one row per stratum
    * (bounded — strata are domains/languages, not data); selection runs
    * through the bounded [[graft.operators.TopKAgg]] at k = max quota,
    * so the shuffle carries <= k rows per (stratum, task), never a
    * stratum's row set; the quota filter joins a broadcast-sized table.
    * Returns the kept rows as (stratumCol, id, rank, quota).
    *
    * Saturation contract: a stratum's quota is capped at its size; a
    * bonus seat landing on a saturated stratum is NOT redistributed
    * (capacity-constrained apportionment is a different algorithm), so
    * the exact-K guarantee holds when no stratum saturates — true
    * whenever K is small relative to the smallest stratum, the eval-
    * sampling regime this operator exists for. Callers needing K under
    * saturation should pre-drop strata smaller than their share.
    */
  def quotaSample(df: DataFrame, stratumCol: String, idCol: String,
      totalK: Int, seed: Long = 42L): DataFrame = {
    require(totalK > 0, "totalK must be positive")
    import df.sparkSession.implicits._
    val census = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val n = census.map(_._2).sum
    val base = census.map { case (s, ns) =>
      (s, ns * totalK / n, ns * totalK % n, ns)
    }
    val extras = (totalK - base.map(_._2).sum).toInt
    val bonus = base.sortBy { case (s, _, rem, _) => (-rem, s) }
      .take(extras).map(_._1).toSet
    val quotas = base.map { case (s, q, _, ns) =>
      (s, math.min(q + (if (bonus(s)) 1L else 0L), ns))
    }
    val qmax = quotas.map(_._2).max.toInt
    val h = pmod(graft.dedup.Dedup.portableHash60(
      concat(col(idCol).cast("string"), lit(s"#$seed"))), lit(1L << 50))
    val ranked = TopK.topKPerGroup(df.withColumn("__h", h),
      Seq(stratumCol), -col("__h"), col(idCol), math.max(qmax, 1))
    ranked.join(broadcast(quotas.toDF(stratumCol, "quota")), Seq(stratumCol))
      .filter(col("rank") <= col("quota"))
      .select(col(stratumCol), col("id").as(idCol), col("rank"), col("quota"))
  }
}
