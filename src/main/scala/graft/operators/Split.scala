package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe train/val/test splitting for training corpora.
  *
  * A naive per-document hash split tears near-duplicate clusters apart:
  * one copy of a boilerplate page lands in train, its near-twin in
  * test, and the eval leaks. The fix is to gate every document on its
  * near-dup COMPONENT representative (from
  * [[graft.dedup.Components.connectedComponents]]) instead of its own
  * id — the whole cluster then moves as one unit, by construction.
  *
  * The gate itself is the portable-hash idiom of the sampling operators
  * (q53/q66): lowercase-hex md5 prefix compared against fixed hex
  * thresholds, so the EXACT assignment is reproducible across runs,
  * engines, and the DuckDB oracle — no `rand()`, no engine-native hash.
  */
object Split {

  /** Deterministic split label for a key: md5 first byte under
    * `trainHex` → train, under `valHex` → val, else test. The defaults
    * "cc"/"e6" give 204/256 ≈ 79.7% train, ≈ 10.2% val, ≈ 10.2% test.
    */
  def splitOf(key: Column, seed: String, trainHex: String = "cc",
      valHex: String = "e6"): Column = {
    val h = substring(md5(concat(lit(seed + "|"), key.cast("string"))), 1, 2)
    when(h < lit(trainHex), "train")
      .when(h < lit(valHex), "val")
      .otherwise("test")
  }

  /** Assign every document a split consistent across its near-dup
    * cluster: docs left-join the component `mapping` (`(id, rep)` —
    * only docs that belong to some duplicate pair appear), singletons
    * fall back to their own id, and the split gate hashes that
    * `split_key`.
    *
    * Scale: the mapping is duplicate-participant-sized — usually far
    * below the corpus — so the join is one shuffle on the id (or a
    * broadcast when the duplicate rate is low; wrap `mapping` in
    * `broadcast()` at the call site to choose).
    */
  def leakageSafeSplit(docs: DataFrame, mapping: DataFrame, idCol: String,
      seed: String = "split42"): DataFrame = {
    val m = mapping.select(col("id").as(idCol), col("rep"))
    docs.join(m, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("rep"), col(idCol)))
      .withColumn("split", splitOf(col("split_key"), seed))
      .drop("rep")
  }
}
