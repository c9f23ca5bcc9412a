package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Centroid assignment over an embedding column — the Lloyd
  * assignment step (and IVF's cell router, cf. [[Ann]]'s IVF path) as
  * a pure scan-local expression: the k centroids are folded into the
  * plan as LITERALS, so assignment is whole-stage-codegen arithmetic
  * with NO join and NO shuffle; only the k-row census that follows
  * shuffles. At 100 TB the corpus never moves — each executor scans
  * its partitions once against the broadcast-by-literal centroids.
  *
  * All distance math is the ordered left-fold double chain of
  * [[Ann.dot]] (`zip_with` then `aggregate` index order), so a SQL
  * engine replaying `list_aggregate(..., 'sum')` produces
  * bit-identical doubles and the argmin — tie-broken by centroid id —
  * is engine-portable with no quantization.
  */
object Centroids {

  /** Squared L2 distance between two float-array columns, accumulated
    * left-to-right in double (the engine-portable summation order).
    */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Assign every row to its nearest centroid (smallest [[sqDist]],
    * ties to the smaller centroid id). `centroids` is small (the k of
    * k-means); each becomes a literal vector in the plan. Output:
    * input columns + (centroid_id, dist) — dist is the exact double.
    */
  def assign(df: DataFrame, embCol: String,
      centroids: Seq[(Long, Seq[Float])]): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val cands = centroids.map { case (cid, vec) =>
      struct(
        sqDist(col(embCol), typedLit(vec)).as("d"),
        lit(cid).as("cid"))
    }
    // least() on structs compares (d, cid) lexicographically — exactly
    // the argmin-with-id-tie-break rule, evaluated inside codegen
    val best = least(cands: _*)
    df.withColumn("centroid_id", best.getField("cid"))
      .withColumn("dist", best.getField("d"))
  }

  /** Deterministic seed centroids: the k rows with the smallest ids.
    * The collect is bounded at k rows (k-means' k, not data-sized) —
    * same contract as [[Ann]]'s IVF training sample.
    */
  def seedByMinId(df: DataFrame, idCol: String, embCol: String,
      k: Int): Seq[(Long, Seq[Float])] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(embCol))
      .orderBy(col(idCol)).limit(k)
      .as[(Long, Seq[Float])].collect().toSeq
  }
}
