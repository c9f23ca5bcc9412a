package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) over a token/key
  * stream — frequency estimation in CONSTANT state.
  *
  * The exact census (q35's groupBy) shuffles every distinct key; at
  * corpus scale the distinct-key space is unbounded. The sketch
  * replaces it with `depth × width` counters: each row of the sketch
  * hashes every key into `width` buckets and the estimate is the MIN
  * over rows — always ≥ the true count, over by at most ~2N/width with
  * probability 1 − 2^−depth. The bucketed representation here is a
  * (row, bucket, cnt) frame: it builds with map-side partial counts
  * (the shuffle carries at most depth × width rows per partition, not
  * the key space), merges across corpora/streams by bucket-wise sum,
  * and broadcasts for estimation joins.
  *
  * Hashing is the portable md5 idiom (q53 rule) so the sketch — and
  * every estimate drawn from it — is bit-identical in any engine.
  */
object CountMin {

  /** Bucket of `key` in sketch row `r`. */
  def bucket(key: Column, r: Int, width: Int): Column =
    pmod(graft.dedup.Dedup.portableHash60(
      concat(lit(r + "|"), key)), lit(width.toLong))

  /** Build the sketch over a key column: one (row, bucket, cnt) frame,
    * ≤ depth×width rows total.
    */
  def sketch(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 1024): DataFrame =
    df.select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), bucket(col(keyCol), r, width).as("bucket"))): _*))
        .as("__rb"))
      .select(col("__rb.r").as("r"), col("__rb.bucket").as("bucket"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for the keys in `queries(keyCol)`: min over sketch
    * rows of the key's bucket count. The sketch frame is tiny by
    * construction — broadcast it.
    */
  def estimate(sk: DataFrame, queries: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val probes = queries.select(col("*"),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("r"), bucket(col(keyCol), r, width).as("bucket"))): _*))
          .as("__rb"))
      .select(col(keyCol), col("__rb.r").as("r"), col("__rb.bucket").as("bucket"))
    probes.join(broadcast(sk), Seq("r", "bucket"))
      .groupBy(col(keyCol))
      .agg(min(col("cnt")).as("est_cnt"))
  }
}
