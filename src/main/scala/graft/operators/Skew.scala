package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffles whose key distribution has heavy
  * hitters. AQE's skew-join split (on by default) handles sort-merge
  * join skew at runtime; these utilities cover the cases AQE cannot
  * re-plan:
  *   - aggregations whose per-key state does not map-side combine
  *     (collect_set/collect_list): ALL rows of a hot key land on one
  *     reducer regardless of AQE,
  *   - joins forced through a single hot key where the other side is
  *     too big to broadcast.
  *
  * The salt is `xxhash64` of the full row (mod nSalts) — deterministic
  * (re-runs and retried tasks agree, unlike `rand()`-salting, which
  * breaks task retry idempotence) and uniform for distinct rows.
  * Identical duplicate rows share a salt; exact-dedup upstream
  * ([[graft.dedup.Dedup.exactSurvivors]]) is the fix when that matters.
  */
object Skew {

  private def saltCol(df: DataFrame, nSalts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(nSalts.toLong)).cast("int")

  /** Salted equi-join: the skewed side's rows scatter across `nSalts`
    * sub-keys; `other` is replicated nSalts× (explode of a literal
    * range — no driver work) so every sub-key finds its match. Use when
    * `other` is too big to broadcast but far smaller than the skewed
    * side — the replication cost is |other|·nSalts, the win is the hot
    * key spreading over nSalts reducers. Row-preserving for the skewed
    * side under "inner" and "left".
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      nSalts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    // right/full joins would emit one null-padded row per REPLICA of an
    // unmatched `other` row (nSalts duplicates) — reject instead of
    // silently multiplying
    val allowed = Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin preserves only the skewed side; joinType '$joinType' " +
        "would duplicate unmatched rows of the replicated side")
    val salted = skewed.withColumn("__salt", saltCol(skewed, nSalts))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase salted collect_set: phase 1 builds per-(key, salt) sets —
    * a hot key's rows split across nSalts reducers, bounding any single
    * task's state — phase 2 merges the ≤ nSalts partial sets per key.
    * Returns `keys ⊕ <outCol>: array` with the array sorted (set
    * semantics made deterministic).
    */
  def saltedCollectSet(df: DataFrame, keys: Seq[String], valueCol: String,
      nSalts: Int = 16, outCol: String = "values"): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    df.withColumn("__salt", saltCol(df, nSalts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(collect_set(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(array_sort(array_distinct(flatten(collect_list(col("__partial")))))
        .as(outCol))
  }

  /** Two-phase salted count: illustrative twin of [[saltedCollectSet]]
    * for counts (hash aggregation already map-side combines counts, so
    * this only wins when upstream partitioning concentrates a hot key's
    * rows — e.g. directly after a key-partitioned shuffle).
    */
  def saltedCountByKey(df: DataFrame, keys: Seq[String],
      nSalts: Int = 16, outCol: String = "cnt"): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    df.withColumn("__salt", saltCol(df, nSalts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__c")).as(outCol))
  }
}
