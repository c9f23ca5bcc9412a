package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (cross-corpus) dedup: filter a NEW batch against an
  * already-ingested reference corpus without joining the two. The
  * reference corpus folds into a compact Bloom filter via a distributed
  * aggregation (`df.stat.bloomFilter` — a treeAggregate of bitsets);
  * the sketch broadcasts once and the new batch filters in one
  * scan-local pass. At 100 TB this replaces the (old ⋈ new) shuffle —
  * whose old side is the whole historical corpus — with a |new|-sized
  * scan plus a few hundred MB broadcast.
  *
  * Bloom semantics: NO false negatives — every row this keeps is
  * guaranteed unseen; false positives drop ~fpp of genuinely-new rows.
  * That is the right trade for crawl dedup (losing 0.1% of new pages is
  * free; re-ingesting the old corpus is not) and the wrong one for
  * exact ledgers — [[exactNewDocs]] is the anti-join twin for those and
  * the oracle surface for this one.
  */
object IncrementalDedup {

  /** Rows of `newDf` whose `textCol` content hash is (probably) absent
    * from `oldDf` — guaranteed-superset-free: never returns a row whose
    * text exists in `oldDf`. NULL texts are kept (a null key never
    * matches anything, so it is "unseen") — the same semantic the
    * [[exactNewDocs]] left-anti twin has, so the two paths differ only
    * by Bloom false positives as documented.
    */
  def bloomNewDocs(oldDf: DataFrame, newDf: DataFrame, textCol: String,
      expectedItems: Long, fpp: Double = 1e-6): DataFrame = {
    val bytes = sketchBytes(oldDf, textCol, expectedItems, fpp)
    if (bytes == null) newDf else filterUnseen(newDf, textCol, bytes)
  }

  // the whole path stays in Catalyst now (the round-4 probe was a
  // Scala UDF because util.sketch.BloomFilter has no Column form):
  // the sketch builds via the BloomFilterAggregate expression —
  // partial per-partition filters OR-merged, same treeAggregate shape
  // as df.stat.bloomFilter — and the probe is BloomFilterMightContain,
  // which carries doGenCode, so the new-batch filter compiles into
  // whole-stage codegen instead of breaking the stage at a UDF.
  // Keys are xxhash64(md5(text)): a 64-bit collision between two
  // DIFFERENT texts is the same event class as a Bloom false positive
  // (drops a genuinely-new row); a seen text always maps to the same
  // key, so the no-false-negative contract is untouched.
  private def key(textCol: String): org.apache.spark.sql.Column =
    xxhash64(md5(col(textCol)))

  private[graft] def sketchBits(expectedItems: Long, fpp: Double): Long = {
    val n = math.max(1L, expectedItems)
    math.max(64L,
      math.ceil(-n.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
  }

  /** Serialized Bloom sketch of `df`'s text-content keys (null when the
    * frame is empty). The binary is the standard
    * `org.apache.spark.util.sketch.BloomFilter` stream format, so
    * sketches built here merge with [[mergeSketches]] and probe with
    * [[filterUnseen]].
    */
  private[graft] def sketchBytes(df: DataFrame, textCol: String,
      expectedItems: Long, fpp: Double = 1e-6): Array[Byte] = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(key(textCol)),
      GraftBridge.expression(lit(math.max(1L, expectedItems))),
      GraftBridge.expression(lit(sketchBits(expectedItems, fpp))))
      .toAggregateExpression()
    df.select(GraftBridge.column(agg).as("bf")).head().getAs[Array[Byte]]("bf")
  }

  /** OR-merge two serialized sketches built with the same
    * (expectedItems, fpp) — the driver-side fold of an incremental
    * ingest loop. Either side may be null (empty frame).
    */
  private[graft] def mergeSketches(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    if (a == null) b
    else if (b == null) a
    else {
      val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
      val fb = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
      fa.mergeInPlace(fb)
      val out = new java.io.ByteArrayOutputStream()
      fa.writeTo(out)
      out.toByteArray
    }
  }

  /** Rows of `newDf` whose content key is (probably) absent from the
    * sketch. NULL texts are kept explicitly (null key never matches
    * anything — the same semantic as the exactNewDocs left-anti twin).
    */
  private[graft] def filterUnseen(newDf: DataFrame, textCol: String,
      bytes: Array[Byte]): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val mightContain = GraftBridge.column(new BloomFilterMightContain(
      GraftBridge.expression(lit(bytes)),
      GraftBridge.expression(key(textCol))))
    newDf.filter(col(textCol).isNull || !mightContain)
  }

  /** Exact twin: left-anti join on the content hash. One shuffle of
    * both sides — correct always, costly when `oldDf` is the full
    * historical corpus.
    */
  def exactNewDocs(oldDf: DataFrame, newDf: DataFrame, textCol: String): DataFrame = {
    val oldH = oldDf.select(md5(col(textCol)).as("__h")).distinct()
    newDf.withColumn("__h", md5(col(textCol)))
      .join(oldH, Seq("__h"), "left_anti").drop("__h")
  }
}
