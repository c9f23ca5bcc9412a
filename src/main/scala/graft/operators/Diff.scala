package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Table reconciliation — the "what changed between corpus drop N and
  * N+1" audit that gates incremental pipelines (and verifies upsert/CDC
  * application, q93/q99). The design rule is NARROW FIRST: each side is
  * projected to `(key, fingerprint)` before anything shuffles, so the
  * full-outer join moves two md5s per row however wide the table is —
  * the wide columns never leave their scan. One key-hash shuffle total;
  * at 100 TB the fingerprint projection is the scan and the join is
  * narrow.
  *
  * Null handling: every compared column is coalesced to a sentinel
  * before hashing (concat_ws silently SKIPS nulls, which would collide
  * `(null, "x")` with `("x", null)`), keeping the fingerprint portable
  * and unambiguous.
  */
object Diff {

  private val Sep = "\u0001"
  private val NullSentinel = "null"

  /** Row fingerprint over `cols` (md5 of sentinel-coalesced values). */
  def fingerprint(cols: Seq[String]): org.apache.spark.sql.Column =
    md5(concat_ws(Sep,
      cols.map(c => coalesce(col(c).cast("string"), lit(NullSentinel))): _*))

  /** Per-key status frame: `(keys…, status)` with status one of
    * added | removed | changed | unchanged (relative to `a` → `b`).
    */
  def diff(a: DataFrame, b: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val ka = a.select(keys.map(col) :+ fingerprint(compareCols).as("__fa"): _*)
    val kb = b.select(keys.map(col) :+ fingerprint(compareCols).as("__fb"): _*)
    ka.join(kb, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__fa").isNull, "added")
          .when(col("__fb").isNull, "removed")
          .when(col("__fa") === col("__fb"), "unchanged")
          .otherwise("changed").as("status"): _*)
  }

  /** One-row census of the diff. */
  def diffCensus(a: DataFrame, b: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame =
    diff(a, b, keys, compareCols).agg(
      F.sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
      F.sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
      F.sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
      F.sum(when(col("status") === "unchanged", 1L).otherwise(0L))
        .as("n_unchanged"))
}
