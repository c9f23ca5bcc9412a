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
    val bloom = oldDf.select(md5(col(textCol)).as("__h"))
      .stat.bloomFilter("__h", math.max(1L, expectedItems), fpp)
    val b = newDf.sparkSession.sparkContext.broadcast(bloom)
    // UDF boundary is deliberate: BloomFilter.mightContain has no
    // Column form; the probe is O(numHashFunctions) bit tests per row
    val unseen = udf((h: String) => h == null || !b.value.mightContainString(h))
    newDf.filter(unseen(md5(col(textCol))))
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
