package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining batches: concatenate documents
  * in a deterministic order within each group and split the token
  * stream into fixed-budget chunks (documents may straddle a chunk
  * boundary — the standard concatenate-then-chunk recipe, which wastes
  * zero tokens to padding). Every assignment is integer window
  * arithmetic: cumulative token count per group → the chunk interval
  * each document occupies — exact, order-stable, and replayable by a
  * SQL oracle.
  *
  * Scale note: each group is one window partition (one sort-run). Do
  * NOT pack a 100 TB corpus as one group — include a deterministic
  * shard column in `groupCols` (e.g. `pmod(xxhash64(id), n)`): packs
  * are then independent per (group, shard), embarrassingly parallel,
  * and reproducible for any fixed n.
  */
object Packing {

  /** Per-document chunk assignment: cumulative size, the first and last
    * chunk the document touches, and its token offset inside the first
    * chunk. Zero-size documents attach to the chunk at their position
    * (start == end). `sizeCol` must be a non-negative integer column.
    */
  def chunkAssignments(df: DataFrame, groupCols: Seq[String],
      orderCol: String, sizeCol: String, budget: Int): DataFrame = {
    require(budget > 0, "packing budget must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(col(sizeCol)).over(w)
    df.withColumn("cum_tokens", cum)
      .withColumn("chunk_start",
        floor((col("cum_tokens") - col(sizeCol)) / budget).cast("long"))
      .withColumn("chunk_end",
        when(col(sizeCol) > 0,
          floor((col("cum_tokens") - 1) / budget).cast("long"))
          .otherwise(col("chunk_start")))
      .withColumn("offset_in_chunk",
        ((col("cum_tokens") - col(sizeCol)) % budget).cast("long"))
  }

  /** Group-level packing census: chunk count (= ceil of total tokens /
    * budget), straddler count, token totals.
    */
  def packingCensus(df: DataFrame, groupCols: Seq[String],
      orderCol: String, sizeCol: String, budget: Int): DataFrame =
    chunkAssignments(df, groupCols, orderCol, sizeCol, budget)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("n_tokens"),
        (max(col("chunk_end")) + 1).as("n_chunks"),
        sum(when(col("chunk_end") > col("chunk_start"), 1L).otherwise(0L))
          .as("n_straddlers"))
}
