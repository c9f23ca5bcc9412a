package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** DSIR-shaped data selection (Xie et al. 2023, arXiv:2302.03169):
  * score every raw document by how much its hashed n-gram distribution
  * looks like a TARGET slice versus the raw corpus, then keep the
  * highest-affinity docs — the standard importance-resampling recipe
  * for skewing a pretraining mix toward a quality exemplar set.
  *
  * DSIR's per-gram signal is the smoothed log-likelihood ratio
  * `log((t_b+1)/(T+B)) − log((r_b+1)/(R+B))` over hashed-gram buckets.
  * This implementation scores with the CROSS-MULTIPLIED surrogate
  * `(t_b+1)(R+B) − (r_b+1)(T+B)` — sign-identical per bucket and pure
  * BIGINT arithmetic, so the exact scores replay in any engine (the
  * q51 integer-thresholds rule). At 100 TB bucket counts grow to where
  * the products need the float log-ratio form anyway — swap the weight
  * expression; every other stage is unchanged.
  *
  * Scale shape: gram hashing is scan-local; the bucket census is one
  * map-side-combined shuffle into `nBuckets` rows — a table SMALL BY
  * CONSTRUCTION (the point of hashing), broadcast back to the second
  * scan; per-doc scoring is one aggregation on the doc key. No join
  * ever shuffles the corpus against the corpus.
  */
object Importance {

  /** Per-raw-document target-affinity scores: `(idCol, n_grams,
    * affinity)` for every document where `isTarget` is false.
    */
  def targetAffinity(df: DataFrame, textCol: String, idCol: String,
      isTarget: Column, nBuckets: Int = 256, n: Int = 2): DataFrame = {
    val grams = df.select(col(idCol), isTarget.as("__t"),
        explode(Dedup.shingles(col(textCol), n)).as("__g"))
      .withColumn("__b",
        pmod(Dedup.portableHash60(col("__g")), lit(nBuckets.toLong)))
    // the bucket census is ≤ nBuckets rows: ONE collect yields the
    // totals AND the weight table as a LITERAL frame (r12, guide §1.2 —
    // the old totals-head + lazy-weights pair re-ran the corpus-wide
    // gram explode+hash three times: totals action, the weight branch
    // and the stream side of the final join; now exactly twice — once
    // for the census, once for the scoring scan, the floor for a
    // two-pass ratio estimator). Weight arithmetic is the identical
    // long math, just evaluated on the driver's copy of the counts.
    val countRows = grams.groupBy(col("__b")).agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("__tc"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__rc"))
      .collect()
    val tTot = countRows.map(_.getLong(1)).sum
    val rTot = countRows.map(_.getLong(2)).sum
    val wRows = countRows.map(r => org.apache.spark.sql.Row(r.getLong(0),
      (r.getLong(1) + 1L) * (rTot + nBuckets)
        - (r.getLong(2) + 1L) * (tTot + nBuckets)))
    val wSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__b",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("__w",
        org.apache.spark.sql.types.LongType)))
    val weights = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(wRows.toIndexedSeq: _*), wSchema)
    grams.filter(!col("__t"))
      .join(broadcast(weights), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("__w")).as("affinity"))
  }
}
