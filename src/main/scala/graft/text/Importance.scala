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
    val counts = grams.groupBy(col("__b")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__tc"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("__rc"))
    // corpus totals: nBuckets rows — a bounded driver-side fold
    val totRow = counts.agg(sum(col("__tc")), sum(col("__rc"))).head()
    val (tTot, rTot) = (totRow.getLong(0), totRow.getLong(1))
    val weights = counts.select(col("__b"),
      ((col("__tc") + 1L) * lit(rTot + nBuckets)
        - (col("__rc") + 1L) * lit(tTot + nBuckets)).as("__w"))
    grams.filter(!col("__t"))
      .join(broadcast(weights), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("__w")).as("affinity"))
  }
}
