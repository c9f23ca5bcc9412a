package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the RAG-indexing / long-document
  * training shape: each document splits into fixed-size token windows
  * whose starts advance by `stride` (stride < size → consecutive chunks
  * overlap by size − stride tokens, the standard sliding-window
  * convention). The last window is capped at the document end, and the
  * chunk count is chosen so every token is covered:
  * m = 1 for n ≤ size, else ⌈(n − size) / stride⌉ + 1.
  *
  * Everything is integer arithmetic on the token array — the explode
  * multiplies rows INSIDE the scan stage (no shuffle anywhere), so the
  * operator pipelines at 100 TB and parallelism follows the input
  * splits. Chunk identity is (doc, chunk_idx), deterministic and
  * replayable by a SQL oracle.
  */
object Chunking {

  /** One row per chunk: (idCol, chunk_idx, chunk_start, chunk_end,
    * n_chunk_tokens, chunk_text) with 1-based inclusive token indices.
    * Null texts are dropped (no chunks).
    */
  def chunk(df: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize (gaps would lose tokens)")
    val tk = TextAnalysis.tokens(col(textCol))
    val n = size(tk).cast("long")
    // ⌈(n − size) / stride⌉ via integer-safe floor; greatest() folds the
    // n ≤ size case into chunk count 1
    val m = (floor((greatest(n - chunkSize, lit(0L)) + (stride - 1))
      / lit(stride.toDouble)) + 1L).cast("long")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), tk.as("__tk"), n.as("__n"),
        explode(sequence(lit(0L), m - 1L)).as("chunk_idx"))
      .withColumn("chunk_start", col("chunk_idx") * stride + 1L)
      .withColumn("chunk_end",
        least(col("chunk_start") + (chunkSize - 1), col("__n")))
      .withColumn("n_chunk_tokens",
        col("chunk_end") - col("chunk_start") + 1L)
      .withColumn("chunk_text", array_join(
        slice(col("__tk"), col("chunk_start").cast("int"),
          col("n_chunk_tokens").cast("int")), " "))
      .drop("__tk", "__n")
  }
}
