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

  /** Token-budget mixture plan — the data-mixing arithmetic that sits
    * BEFORE any sampling operator runs: given target mixture weights
    * per source (basis points, the integer convention) and the
    * per-source token inventory, compute the LARGEST training budget T
    * such that every weighted source demand `w_s·T/10000` is servable
    * within `maxEpochs` passes over that source's data, then each
    * source's token allotment and the repetition factor it implies.
    * The binding source (the one whose inventory×maxEpochs cap is hit
    * exactly) is marked — that is the row a data engineer acts on
    * (raise its epoch cap, lower its weight, or collect more of it).
    *
    * All arithmetic is integer (floor division; epochs reported in
    * milli-epochs = ⌈allotted·1000/available⌉) so the whole plan
    * replays bit-exactly in a SQL oracle. Sources with weight 0 or
    * absent from `weightsBp` contribute nothing and never bind.
    * A weighted source with ZERO inventory binds the budget to 0 —
    * the correct answer (the requested mix is unbuildable), surfaced
    * rather than silently renormalized.
    *
    * Scale shape: one per-source token aggregation (map-side combined,
    * one shuffle of |sources| rows), a literal weight table joined on
    * the driver-sized result, a global min over |sources| rows. The
    * corpus is scanned once; the plan is |sources| rows.
    *
    * Overflow bound: `available·maxEpochs·10000` must fit a BIGINT —
    * available ≤ 9.2e14 tokens at maxEpochs 100, comfortably above any
    * single-source inventory.
    */
  def mixturePlan(df: DataFrame, sourceCol: String, tokenCol: String,
      weightsBp: Map[String, Long], maxEpochs: Long = 4L): DataFrame = {
    require(weightsBp.values.sum == 10000L,
      s"mixture weights must sum to 10000 bp, got ${weightsBp.values.sum}")
    require(weightsBp.values.forall(_ >= 0L), "weights must be >= 0")
    require(maxEpochs >= 1L, "maxEpochs must be >= 1")
    import df.sparkSession.implicits._
    val weights = weightsBp.toSeq.sortBy(_._1).toDF(sourceCol, "weight_bp")
    val avail = df.groupBy(col(sourceCol))
      .agg(sum(col(tokenCol)).cast("long").as("available_tokens"))
    // full outer: a weighted source with no data must surface (it
    // binds T to 0), and an unweighted source still reports inventory
    val plan = weights.join(avail, Seq(sourceCol), "full_outer")
      .select(col(sourceCol),
        coalesce(col("weight_bp"), lit(0L)).as("weight_bp"),
        coalesce(col("available_tokens"), lit(0L)).as("available_tokens"))
      .withColumn("__cap",
        when(col("weight_bp") === 0L, lit(Long.MaxValue))
          // integer floor division (div, not /): the plan must replay
          // bit-exactly, and double division loses exactness past 2^53
          .otherwise(expr(
            s"(available_tokens * $maxEpochs * 10000) div weight_bp")))
    val budget = plan.agg(min(col("__cap")).as("budget_tokens"))
    plan.crossJoin(budget)
      .withColumn("allotted_tokens",
        expr("(weight_bp * budget_tokens) div 10000"))
      .withColumn("epochs_milli",
        when(col("allotted_tokens") === 0L, lit(0L))
          // integer ceil: (a·1000 + avail − 1) div avail
          .otherwise(expr("(allotted_tokens * 1000 + available_tokens - 1)" +
            " div available_tokens")))
      .withColumn("binding", col("__cap") === col("budget_tokens"))
      .select(col(sourceCol), col("weight_bp"), col("available_tokens"),
        col("budget_tokens"), col("allotted_tokens"), col("epochs_milli"),
        col("binding"))
  }
}
