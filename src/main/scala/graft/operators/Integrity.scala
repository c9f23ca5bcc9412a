package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the dbt-test / Deequ shape): each
  * check reduces a table to ONE row `(check, n_bad, n_total)`, and a
  * suite is the union of its checks — a single action gates a
  * pipeline stage. Every check is aggregation-only or one anti-join:
  *
  *  - `uniqueKey`: duplicate-key census via one groupBy (map-side
  *    combined; no self-join);
  *  - `notNull`: scan-local null count;
  *  - `foreignKey`: orphan census via LEFT ANTI join on the key — the
  *    dimension side streams/broadcasts, the fact side never moves
  *    more than once;
  *  - `accepted`: domain-violation count, scan-local.
  *
  * At 100 TB each check is one pass over its table; the union of
  * 1-row aggregates is driver-free and the suite runs as one job.
  */
object Integrity {

  /** Rows whose `keys` tuple occurs more than once. */
  def uniqueKey(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(when(col("n") > 1, col("n"))), lit(0L)).as("n_bad"),
        coalesce(sum(col("n")), lit(0L)).as("n_total"))
      .select(lit(name).as("check"), col("n_bad"), col("n_total"))

  /** Null (or NaN-free for doubles handled upstream) violations. */
  def notNull(df: DataFrame, name: String, column: String): DataFrame =
    df.agg(coalesce(sum(when(col(column).isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_bad"),
        count(lit(1)).as("n_total"))
      .select(lit(name).as("check"), col("n_bad"), col("n_total"))

  /** Fact rows whose `fkCol` has no match in `dim.pkCol` (null FKs
    * count as orphans — use [[notNull]] separately to distinguish).
    */
  def foreignKey(fact: DataFrame, name: String, fkCol: String,
      dim: DataFrame, pkCol: String): DataFrame = {
    val orphans = fact.select(col(fkCol))
      .join(dim.select(col(pkCol).as(fkCol)), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("n_bad"))
    val total = fact.agg(count(lit(1)).as("n_total"))
    orphans.crossJoin(total)
      .select(lit(name).as("check"), col("n_bad"), col("n_total"))
  }

  /** Values outside an accepted literal domain (nulls not counted). */
  def accepted(df: DataFrame, name: String, column: String,
      domain: Seq[String]): DataFrame =
    df.agg(coalesce(sum(when(col(column).isNotNull &&
          !col(column).isInCollection(domain), 1L).otherwise(0L)),
          lit(0L)).as("n_bad"),
        count(lit(1)).as("n_total"))
      .select(lit(name).as("check"), col("n_bad"), col("n_total"))

  /** Run a suite: union of single-row checks, ordered by check name. */
  def suite(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _).orderBy(col("check"))
}
