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

  // ------------------------------------------- length-bucketed batching
  /** Length-bucketed batch assignment — the PADDED-batch recipe (for
    * fine-tuning/eval pipelines where documents may NOT straddle and
    * every sequence in a batch pads to the batch max): group rows into
    * length buckets of `bucketWidth` tokens, order each bucket by the
    * seeded portable hash (so batches are reproducible yet shuffled),
    * and cut fixed `batchSize` batches inside each bucket. Because
    * batch-mates come from the same bucket, the pad target is bounded
    * by the bucket ceiling — the standard length-grouped batching win
    * over naive hash-ordered batches, whose pad target is the corpus
    * max.
    *
    * Emits (input columns, bucket, batch_idx, pos_in_batch). Zero- or
    * negative-size rows land in bucket 0. One shuffle on the bucket
    * key; per-bucket window sorts only that bucket's rows — shard hot
    * buckets with an extra group column exactly as [[chunkAssignments]]
    * documents.
    */
  def lengthBucketedBatches(df: DataFrame, idCol: String, sizeCol: String,
      bucketWidth: Int, batchSize: Int, seed: Long = 42L): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0,
      "bucketWidth and batchSize must be positive")
    val bucket = when(col(sizeCol) <= 0, lit(0L))
      .otherwise(expr(s"($sizeCol - 1) div $bucketWidth").cast("long"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(Sampling.hashOrder(col(idCol), seed), col(idCol))
    df.withColumn("bucket", bucket)
      .withColumn("__rn", row_number().over(w))
      .withColumn("batch_idx", expr("(__rn - 1) div " + batchSize)
        .cast("long"))
      .withColumn("pos_in_batch", ((col("__rn") - 1) % batchSize)
        .cast("long"))
      .drop("__rn")
  }

  /** Padding-waste census over [[lengthBucketedBatches]]: one row per
    * (bucket, batch) with the batch's pad target (its max length),
    * total padded tokens (Σ max − len), and utilization in basis
    * points (Σ len · 10000 div (n · max)) — the number that justifies
    * bucketing over naive batching. Integer arithmetic throughout.
    */
  def paddingCensus(df: DataFrame, idCol: String, sizeCol: String,
      bucketWidth: Int, batchSize: Int, seed: Long = 42L): DataFrame =
    lengthBucketedBatches(df, idCol, sizeCol, bucketWidth, batchSize, seed)
      .groupBy(col("bucket"), col("batch_idx"))
      .agg(
        count(lit(1)).as("n_rows"),
        max(col(sizeCol)).cast("long").as("pad_to"),
        sum(col(sizeCol)).cast("long").as("sum_len"))
      .withColumn("padded_tokens",
        col("n_rows") * col("pad_to") - col("sum_len"))
      .withColumn("utilization_bp",
        when(col("pad_to") <= 0L, lit(10000L))
          .otherwise(expr("(sum_len * 10000) div (n_rows * pad_to)")))
}
