package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over the document corpus: inverted-index
  * construction and conjunctive term queries ranked by total query-term
  * frequency — integer-exact relevance (the tf component of BM25; the
  * idf/length factors are floats and deliberately left out of the
  * oracle-checked surface).
  *
  * Scale shape: [[invertedIndex]] is one explode + one map-side-combined
  * count on the (term, doc) key — the build you'd persist bucketed by
  * `term` (see [[graft.sources.Bucketing]]) so a serving query reads
  * only its terms' buckets. [[conjunctiveTopK]] answers a query without
  * a prebuilt index in ONE shuffle: the term filter is a literal IN
  * that pipelines inside the scan, the per-doc aggregation map-side
  * combines, and the top-k is a TakeOrdered (no global sort).
  */
object Search {

  /** Postings: (term, idCol, tf), one row per distinct term per doc. */
  def invertedIndex(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))

  /** Documents containing ALL query terms, ranked by summed term
    * frequency (descending, doc id ascending on ties), top `k`.
    * `terms` must be distinct.
    */
  def conjunctiveTopK(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "query terms must be non-empty and distinct")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol))
      .agg(count_distinct(col("term")).as("__matched"),
        count(lit(1)).as("score"))
      .filter(col("__matched") === terms.size)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
