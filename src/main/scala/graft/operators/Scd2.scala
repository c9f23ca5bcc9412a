package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD TYPE 2 — history-preserving dimension maintenance (the
  * warehouse sibling of [[Upsert]]'s overwrite-in-place SCD1): instead
  * of replacing a changed row, the open version is CLOSED
  * (`valid_to = asOf`, `is_current = false`) and a new open version
  * appended, so every key carries its full validity-interval history
  * and any past state is recoverable with
  * `valid_from <= t AND (valid_to IS NULL OR t < valid_to)`.
  *
  * Version columns: `valid_from: long`, `valid_to: long` (null = open),
  * `is_current: boolean`. `asOf` is the batch's effective timestamp —
  * one timestamp per batch, the usual snapshot-feed contract.
  *
  * Scale shape: closed history NEVER joins — it is filtered out and
  * bag-concatenated back (at 100 TB the history dwarfs the open set
  * and stays untouched on disk under a partition-scoped write). Open
  * rows full-outer-join the change batch on the key — ONE hash join,
  * change batches are small so AQE broadcasts them and the open set
  * never shuffles. Each joined row then emits its output versions
  * (carry / no-op / close+reopen / insert) as an array exploded in the
  * SAME projection — one pass, not one filter-branch re-join per case.
  * Attribute comparison is null-safe struct equality.
  */
object Scd2 {

  /** Initialize a dimension snapshot as an all-open SCD2 table. */
  def initial(snapshot: DataFrame, validFrom: Long): DataFrame =
    snapshot
      .withColumn("valid_from", lit(validFrom))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))

  /** Apply one change batch (`keys` ++ `attrs`, unique per key) to an
    * SCD2 table at effective time `asOf`. Change rows whose attributes
    * null-safe-equal the open version are no-ops; differing rows close
    * the open version and append a new one; unknown keys insert; open
    * rows absent from the batch carry over; closed rows pass through
    * without joining.
    */
  def apply(table: DataFrame, changes: DataFrame, keys: Seq[String],
      attrs: Seq[String], asOf: Long): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val history = table.filter(!col("is_current"))
    val open = table.filter(col("is_current")).withColumn("__o", lit(1))
    val chg = changes
      .select((keys ++ attrs).map(c => col(c).as(s"c_$c")): _*)
      .withColumn("__c", lit(1))
    val joinCond = keys.map(k => col(k) === col(s"c_$k")).reduce(_ && _)
    val j = open.join(chg, joinCond, "full_outer")

    val oPresent = col("__o").isNotNull
    val cPresent = col("__c").isNotNull
    val sameAttrs =
      struct(attrs.map(col): _*) <=> struct(attrs.map(a => col(s"c_$a")): _*)
    def ver(keyCols: Seq[Column], attrCols: Seq[Column], from: Column,
        to: Column, cur: Column): Column =
      struct(
        keys.zip(keyCols).map { case (n, c) => c.as(n) } ++
          attrs.zip(attrCols).map { case (n, c) => c.as(n) } ++
          Seq(from.as("valid_from"), to.cast("long").as("valid_to"),
            cur.as("is_current")): _*)

    val openVer = ver(keys.map(col), attrs.map(col),
      col("valid_from"), col("valid_to"), col("is_current"))
    val closedVer = ver(keys.map(col), attrs.map(col),
      col("valid_from"), lit(asOf), lit(false))
    val reopenVer = ver(keys.map(col), attrs.map(a => col(s"c_$a")),
      lit(asOf), lit(null), lit(true))
    val insertVer = ver(keys.map(k => col(s"c_$k")),
      attrs.map(a => col(s"c_$a")), lit(asOf), lit(null), lit(true))

    val versions =
      when(oPresent && !cPresent, array(openVer))
        .when(oPresent && cPresent && sameAttrs, array(openVer))
        .when(oPresent && cPresent && !sameAttrs,
          array(closedVer, reopenVer))
        .otherwise(array(insertVer))
    val applied = j.select(explode(versions).as("r")).select(col("r.*"))
    history.select(applied.columns.map(col): _*).unionByName(applied)
  }

  /** Point-in-time view of an SCD2 table: the version of each key
    * valid at `t` (keys born after `t` absent). Scan-local filter —
    * no join, no shuffle.
    */
  def asOfView(table: DataFrame, t: Long): DataFrame =
    table.filter(col("valid_from") <= t &&
      (col("valid_to").isNull || lit(t) < col("valid_to")))
}
