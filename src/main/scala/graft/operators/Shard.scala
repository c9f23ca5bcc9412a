package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic global training-order shuffle — WITHOUT a global sort.
  *
  * Training runs read the corpus in a shuffled order that must be
  * reproducible (restarts, multi-epoch seeds, cross-engine rebuilds).
  * The naive formulation — `ORDER BY hash(id)` over the whole corpus —
  * funnels 100 TB through a total ordering; the scalable layout is the
  * classic two-level shape: a portable per-row hash supplies BOTH the
  * shard (its leading bits) and the within-shard order (the full hex
  * string), so shard assignment is a scan-stage projection, the
  * repartition moves each row once, and each writer task sorts only its
  * own shard. Readers that concatenate shard 0..n-1 in within-shard
  * order observe exactly the global `ORDER BY hash` sequence — the
  * hash's leading bits ARE its most significant sort key.
  *
  * Portability rule of q53/q66: the hash is md5 of `id#seed`, computed
  * identically by the DuckDB oracle, so the exact assignment and order
  * are hash-checkable.
  */
object Shard {

  /** Portable order key for a row. */
  def orderKey(idCol: String, seed: Long) =
    md5(concat(col(idCol).cast("string"), lit("#" + seed)))

  /** Shard index in [0, nShards): the order key's leading 16 bits,
    * RANGE-divided (not mod — mod would interleave shards through the
    * key space and break the concatenation-order guarantee). Uniform in
    * distribution; `nShards` must divide 65536 (powers of two in
    * practice).
    */
  def shardOf(orderKeyCol: org.apache.spark.sql.Column, nShards: Int) = {
    require(65536 % nShards == 0, s"nShards must divide 65536, got $nShards")
    floor(conv(substring(orderKeyCol, 1, 4), 16, 10).cast("int")
      / lit(65536 / nShards)).cast("int")
  }

  /** The writer-ready layout: `order_key` + `shard` columns, ranged into
    * `nShards` output partitions and sorted within each — one shuffle,
    * no single-reducer stage, no sampling-dependent boundaries in the
    * RESULT (range boundaries only affect partition placement; the
    * deterministic columns travel with the rows).
    */
  def trainingOrder(df: DataFrame, idCol: String, seed: Long,
      nShards: Int): DataFrame = {
    val keyed = df.withColumn("order_key", orderKey(idCol, seed))
      .withColumn("shard", shardOf(col("order_key"), nShards))
    keyed.repartitionByRange(nShards, col("shard"), col("order_key"))
      .sortWithinPartitions(col("shard"), col("order_key"))
  }
}
