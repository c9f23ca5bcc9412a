package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) transformation — the code/infilling
  * pretraining transform (Bavarian et al. 2022, arXiv:2207.14255):
  * split a document's token stream into (prefix, middle, suffix) and
  * re-emit it in PSM order — `<PRE> prefix <SUF> suffix <MID> middle`
  * — so the model learns to generate the middle conditioned on both
  * sides. Applied to a deterministic hash-gated fraction of documents
  * (the "FIM rate"); the rest pass through untouched, exactly as
  * pretraining mixes do.
  *
  * Determinism: the gate and both split points are integer arithmetic
  * over the seeded portable hash and the token count — no `rand()` —
  * so the transformed corpus replays bit-exactly across runs, retries,
  * and engines (the q53 md5-gate rule). Split points: prefix takes
  * ⌊n·prefixBp/10000⌋ tokens, middle the next ⌊n·middleBp/10000⌋; a
  * document too short for a non-empty middle still transforms (empty
  * segments render as empty strings), which matches the reference
  * recipe's behavior of keeping the sentinels.
  *
  * Scale: one scan-local projection per row — no shuffle, no UDF; the
  * slices and joins are Catalyst array functions inside whole-stage
  * codegen.
  */
object Fim {

  val Pre = "<PRE>"
  val Suf = "<SUF>"
  val Mid = "<MID>"

  /** Adds `fim_applied` and `fim_text` (the PSM rendering for gated
    * rows; the original text otherwise). `rateBp` is the FIM rate in
    * basis points; `prefixBp`/`middleBp` the token-share split points.
    */
  def fimTransform(df: DataFrame, textCol: String, idCol: String,
      rateBp: Long = 5000L, prefixBp: Long = 3333L,
      middleBp: Long = 3334L, seed: Long = 42L): DataFrame = {
    require(rateBp >= 0L && rateBp <= 10000L, "rateBp in [0, 10000]")
    require(prefixBp >= 0L && middleBp >= 0L && prefixBp + middleBp <= 10000L,
      "prefix/middle shares must be non-negative and sum <= 10000 bp")
    val gate = pmod(graft.dedup.Dedup.portableHash60(
      concat(col(idCol).cast("string"), lit(s"#fim$seed"))), lit(10000L))
    df.withColumn("__tk", TextAnalysis.tokens(col(textCol)))
      .withColumn("__n", size(col("__tk")).cast("long"))
      .withColumn("__p", expr(s"(__n * $prefixBp) div 10000"))
      .withColumn("__m", expr(s"(__n * $middleBp) div 10000"))
      .withColumn("fim_applied", gate < lit(rateBp))
      .withColumn("fim_text",
        when(!col("fim_applied"), col(textCol)).otherwise(concat(
          lit(Pre + " "),
          array_join(slice(col("__tk"), lit(1), col("__p").cast("int")), " "),
          lit(" " + Suf + " "),
          array_join(slice(col("__tk"),
            (col("__p") + col("__m") + 1L).cast("int"),
            (col("__n") - col("__p") - col("__m")).cast("int")), " "),
          lit(" " + Mid + " "),
          array_join(slice(col("__tk"), (col("__p") + 1L).cast("int"),
            col("__m").cast("int")), " "))))
      .drop("__tk", "__n", "__p", "__m")
  }
}
