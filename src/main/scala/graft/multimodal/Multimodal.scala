package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns + typed metadata, with batch feature
  * extraction via mapPartitions (the Scala analog of arrow-batched
  * Python UDFs: per-partition decoder init, row-batch processing).
  *
  * The actual codecs (image decode, audio resample, video frame
  * sampling) are STUBBED — this container has no media libraries — with
  * a deterministic digest-based fake, clearly marked below. Everything
  * Spark-side is real and tested: schema, binary handling, partitioned
  * batch shape, feature output contract.
  */
object Multimodal {

  /** Demo binary table: documents' text bytes as media payloads with a
    * metadata struct — the schema a real pipeline would carry for
    * image/audio blobs (modality, byte size, content hash).
    */
  def asBinaryTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit("text-bytes").as("modality"),
        octet_length(col(textCol)).as("n_bytes"),
        md5(col(textCol)).as("content_md5")).as("meta"))

  /** STUB — media decode. A real deployment decodes the codec here
    * (e.g. JPEG → pixel array) with a per-partition native handle; this
    * container has no media libraries, so a deterministic MD5-digest
    * expansion stands in. The signature and batch shape are the real
    * contract.
    */
  private def decodeStub(bytes: Array[Byte], dim: Int,
      md: java.security.MessageDigest): Array[Float] = {
    md.reset()
    val digest = md.digest(bytes)
    Array.tabulate(dim)(i => (digest(i % digest.length).toInt & 0xff) / 255.0f)
  }

  /** Batch feature extraction over binary content: one decoder instance
    * per partition (the expensive-init pattern of real codecs), rows
    * streamed through it. Output: (media_id, features array<float>).
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => (id, decodeStub(bytes, dim, md)) }
      }
      .toDF("media_id", "features")
  }

  /** Frame sampling plumbing: split a payload into fixed-size "frames"
    * (the video analog) and emit one row per sampled frame — the
    * row-explosion shape of real frame extraction, with the decode
    * stubbed to byte-slicing.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
      everyNth: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = math.max(1, bytes.length / frameBytes)
        (0 until nFrames by everyNth).map { f =>
          val start = f * frameBytes
          val frame = bytes.slice(start, math.min(bytes.length, start + frameBytes))
          (id, f, frame.length)
        }
      }
      .toDF("media_id", "frame_index", "frame_bytes")
  }
}
