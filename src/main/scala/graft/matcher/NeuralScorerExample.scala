package graft.matcher

import graft.schema.PairSchema

/** Worked example of the neural-matcher deployment path (the wiring the
  * reference's DeepMatcher/DeepER/BERT wrappers exist for, reference
  * models/dm.py:241-315, models/bert.py:41-297): an ONNX-Runtime-shaped
  * session factory pushed through [[ExternalBatchScorer]]'s
  * mapPartitions boundary.
  *
  * This container ships no model runtime, so [[EmbeddingSession]] is a
  * deterministic stand-in that still exercises every piece of the real
  * shape:
  *   - a weight FILE resolved and loaded once PER PARTITION (exactly
  *     where `new OrtSession(env, modelPath)` would go; at cluster
  *     scale the file arrives via `SparkContext.addFile` /
  *     `SparkFiles.get`, or a distributed store path),
  *   - batch inference over encoded pair texts (hashed bag-of-words →
  *     mean-pooled embeddings → cosine, squashed to a probability — the
  *     arithmetic skeleton of a bi-encoder matcher),
  *   - session release on partition completion (`AutoCloseable`, the
  *     hook [[ExternalBatchScorer]] invokes when the partition drains —
  *     ONNX sessions hold native memory).
  *
  * Swapping [[EmbeddingSession]] for an `OrtSession` wrapper changes no
  * Spark-side line.
  */
object NeuralScorerExample {

  /** Write a deterministic little-endian float32 weight table (vocab
    * buckets × dim) — the "model file" of the example; a real deployment
    * ships an .onnx file instead.
    */
  def writeWeights(path: String, buckets: Int = 64, dim: Int = 8,
      seed: Long = 42L): Unit = {
    val bb = java.nio.ByteBuffer.allocate(buckets * dim * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < buckets * dim) {
      // hash-derived weights in [-1, 1): reproducible everywhere
      val h = scala.util.hashing.MurmurHash3.stringHash(s"$seed|$i")
      bb.putFloat(((h % 1000) / 1000.0f))
      i += 1
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bb.array())
  }

  /** The session stand-in: loads the weight file once, scores batches,
    * releases on close. Instrumented with global counters so specs can
    * assert the per-partition init/close lifecycle.
    */
  final class EmbeddingSession(modelPath: String, dim: Int = 8)
      extends (Seq[(Seq[String], Seq[String])] => Seq[Double])
      with AutoCloseable {
    NeuralScorerExample.sessionsOpened.incrementAndGet()
    private val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(modelPath))
    private val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    private val buckets = bytes.length / (dim * 4)

    private def embed(texts: Seq[String]): Array[Double] = {
      val v = new Array[Double](dim)
      val toks = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      for (t <- toks) {
        val b = math.floorMod(scala.util.hashing.MurmurHash3.stringHash(t), buckets)
        var j = 0
        while (j < dim) { v(j) += bb.getFloat((b * dim + j) * 4); j += 1 }
      }
      if (toks.nonEmpty) { var j = 0; while (j < dim) { v(j) /= toks.size; j += 1 } }
      v
    }

    override def apply(batch: Seq[(Seq[String], Seq[String])]): Seq[Double] =
      batch.map { case (l, r) =>
        val (a, b) = (embed(l), embed(r))
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        val cos = if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
        1.0 / (1.0 + math.exp(-4.0 * cos)) // calibrated squash
      }

    override def close(): Unit =
      NeuralScorerExample.sessionsClosed.incrementAndGet()
  }

  val sessionsOpened = new java.util.concurrent.atomic.AtomicInteger(0)
  val sessionsClosed = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The full drop-in scorer: model path captured in the closure, one
    * session per partition, BERT-ish batch size.
    */
  def scorer(modelPath: String, batchSize: Int = 8,
      schema: PairSchema = PairSchema.default): ExternalBatchScorer =
    new ExternalBatchScorer(() => new EmbeddingSession(modelPath), batchSize, schema)
}
