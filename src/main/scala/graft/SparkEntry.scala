package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every query in [[queries]]
  * with an entry in [[oracleSql]] is hash-checked against DuckDB on the
  * sf0.01 fixtures; queries without an oracle get a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * a full CERTA saliency explanation computed by the live explainer.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q25_certa_saliency")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.ErQueries.queries ++
      graft.queries.PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.ErQueries.oracles ++
      graft.queries.PipelineQueries.oracles
}
