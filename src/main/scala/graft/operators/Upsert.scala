package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD1 MERGE / upsert: the incremental-corpus maintenance step (Delta
  * Lake's `MERGE WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT`
  * shape) as plain DataFrame algebra — a recrawl batch replaces changed
  * documents and appends new ones without rewriting untouched history
  * by hand.
  *
  * Scale shape: ONE hash join on the key. The current corpus is the big
  * side and streams through the join; the update batch is the small
  * side (a crawl increment), so AQE broadcasts it and the corpus never
  * shuffles — the same asymmetry Delta exploits with file pruning. The
  * union is a no-shuffle bag concat. Nothing collects.
  */
object Upsert {

  /** Merged view: `updates` rows win wholesale on key collision,
    * unmatched update rows insert, unmatched current rows carry over.
    * `updates` must be unique per key (pre-aggregate a multi-version
    * batch with e.g. max-by(version) first); uniqueness of `current`
    * is preserved, not required.
    */
  def upsert(current: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    current.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)
  }

  /** Change census for audit/monitoring: one row with how many keys the
    * merge would insert / update (key present on both sides but any of
    * `compareCols` differs) / leave unchanged. Full outer join on the
    * key — same single-shuffle shape; null-safe comparison so NULL
    * column values compare equal.
    */
  def changeCensus(current: DataFrame, updates: DataFrame,
      keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val cur = current.select((keys ++ compareCols).map(col): _*)
      .withColumn("__cur", lit(1))
    val upd = updates.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"__u_$c")): _*)
      .withColumn("__upd", lit(1))
    val changed = compareCols
      .map(c => not(col(c) <=> col(s"__u_$c")))
      .reduce(_ || _)
    cur.join(upd, keys, "full_outer")
      .agg(
        sum(when(col("__cur").isNull, 1L).otherwise(0L)).as("n_inserted"),
        sum(when(col("__cur").isNotNull && col("__upd").isNotNull && changed,
          1L).otherwise(0L)).as("n_updated"),
        sum(when(col("__cur").isNotNull && col("__upd").isNotNull && !changed,
          1L).otherwise(0L)).as("n_unchanged"),
        sum(when(col("__upd").isNull, 1L).otherwise(0L)).as("n_untouched"))
  }
}
