package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) ANN — the memory-compression workhorse of
  * billion-vector indexes (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 2011; FAISS's `IndexPQ`): the
  * vector space is split into `m` contiguous subspaces, each gets its
  * own small k-means codebook, and every corpus vector is stored as
  * `m` one-byte-ish codes instead of `dim` floats. A query scans codes
  * with an ADC (asymmetric distance computation) lookup table —
  * `m` array-index adds per vector instead of `dim` multiplies — then
  * reranks a small overfetched shortlist with exact distances.
  *
  * This implementation rides the fixed-point Lloyd machinery of
  * [[Centroids]] end to end, so every quantity — codebooks, codes,
  * LUT entries, ADC sums, rerank distances — is an INTEGER and the
  * whole path (training included) replays bit-for-bit in any SQL
  * engine: the correctness bar no other PQ implementation bothers to
  * clear, and the property that makes the oracle check possible.
  *
  * Scale shape (100 TB): training scans the corpus `m·iters` times
  * against literal centroids (no joins; the per-iteration shuffle is
  * the k×(dim/m+1) census); encoding is one scan-local pass (codes
  * are `least()` over literal structs inside codegen); an ADC query
  * is a scan of the CODES table only — `m` longs per row instead of
  * the embedding — plus a TakeOrdered, with exact rerank touching just
  * `k·overfetch` full vectors. The codes table is what you'd persist:
  * 16x smaller than the float embeddings at m=8/dim=64.
  */
object Pq {

  /** One trained codebook per subspace. `bounds(s) = (start, len)`
    * (1-based start, [[org.apache.spark.sql.functions.slice]]
    * convention).
    */
  final case class PqModel(bounds: Seq[(Int, Int)],
      books: Seq[Seq[(Long, Seq[Long])]], scale: Long)

  /** Contiguous equal splits of `dim` into `m` subspaces (the last one
    * takes the remainder).
    */
  def subspaceBounds(dim: Int, m: Int): Seq[(Int, Int)] = {
    require(m > 0 && dim >= m, "need 1 <= m <= dim")
    val base = dim / m
    (0 until m).map { s =>
      val start = s * base + 1
      val len = if (s == m - 1) dim - (m - 1) * base else base
      (start, len)
    }
  }

  /** Train per-subspace fixed-point codebooks
    * ([[Centroids.lloydTrain]] on each slice).
    */
  def train(df: DataFrame, idCol: String, embCol: String, dim: Int,
      m: Int, k: Int, iters: Int, scale: Long = 4096L): PqModel = {
    val bounds = subspaceBounds(dim, m)
    val books = bounds.map { case (start, len) =>
      Centroids.lloydTrain(
        df.withColumn("__sub", slice(col(embCol), start, len)),
        idCol, "__sub", k, iters, scale)
    }
    PqModel(bounds, books, scale)
  }

  /** Encode every vector: adds `code_0 .. code_{m-1}` (the nearest
    * subspace centroid ids, integer distance, ties to smaller id).
    * Scan-local literal arithmetic — no join, no shuffle.
    */
  def encode(df: DataFrame, embCol: String, model: PqModel): DataFrame =
    model.bounds.zipWithIndex.foldLeft(df) {
      case (acc, ((start, len), s)) =>
        val sub = Centroids.quantizeVec(
          slice(col(embCol), start, len), model.scale)
        val cands = model.books(s).map { case (cid, vec) =>
          struct(Centroids.sqDistLong(sub, typedLit(vec)).as("d"),
            lit(cid).as("cid"))
        }
        acc.withColumn(s"code_$s", least(cands: _*).getField("cid"))
    }

  /** ADC top-`k` for one probe with exact integer rerank: scan the
    * encoded corpus summing `m` LUT lookups (approximate distance),
    * shortlist `k * overfetch` by (adc, id), rerank the shortlist with
    * the exact quantized distance, return top-`k` by (exact, id) as
    * `(idCol, adc_q, dist_q)`. All integers end to end.
    */
  def adcTopK(encoded: DataFrame, embCol: String, idCol: String,
      model: PqModel, probe: Seq[Float], k: Int, overfetch: Int = 4,
      excludeId: Option[Long] = None): DataFrame = {
    val m = model.bounds.size
    // LUT: per subspace, distance from the probe's quantized slice to
    // each codebook entry — m·k integers, computed driver-side with
    // the same exact floor(double·scale) arithmetic
    val luts: Seq[Map[Long, Long]] = model.bounds.zipWithIndex.map {
      case ((start, len), s) =>
        val ps = probe.slice(start - 1, start - 1 + len)
          .map(x => math.floor(x.toDouble * model.scale).toLong)
        model.books(s).map { case (cid, vec) =>
          cid -> vec.zip(ps).map { case (a, b) =>
            val d = a - b; d * d
          }.sum
        }.toMap
    }
    val adc = (0 until m).map(s =>
        element_at(typedLit(luts(s)), col(s"code_$s")))
      .reduce(_ + _)
    val base = excludeId match {
      case Some(x) => encoded.filter(col(idCol) =!= x)
      case None => encoded
    }
    val shortlist = base.withColumn("adc_q", adc)
      .orderBy(col("adc_q").asc, col(idCol).asc)
      .limit(k * overfetch)
    val pq = Centroids.quantizeVec(typedLit(probe), model.scale)
    shortlist
      .withColumn("dist_q", Centroids.sqDistLong(
        Centroids.quantizeVec(col(embCol), model.scale), pq))
      .orderBy(col("dist_q").asc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("adc_q"), col("dist_q"))
  }
}
