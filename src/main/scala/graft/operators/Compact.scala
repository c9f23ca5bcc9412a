package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance chore every long-lived
  * 100 TB corpus needs: streaming CDC appends, per-batch upserts and
  * incremental dedup all leave directories of KB-scale files whose
  * open/footer costs eventually dominate scans.
  *
  * [[compact]] sizes the rewrite from the directory's CURRENT on-disk
  * bytes (a FileSystem metadata listing — no data read), targets
  * `ceil(bytes / targetBytes)` output files via a round-robin
  * repartition (row-count balancing approximates byte balancing for
  * homogeneous rows; re-compression can land the realized sizes above
  * or below target), writes the replacement COMPLETELY into a sibling
  * directory first, and only then swaps it in. The crash window is the
  * delete→rename pair at the very end — strictly smaller than
  * rewriting in place — and a crash before it leaves the original
  * untouched plus an orphaned `.compacting` sibling that the next run
  * clears. On object stores the rename is a copy; run compaction
  * per-partition-directory there (the partitioned layouts of
  * [[Upsert.upsertPartitioned]] make each partition an independent
  * compaction unit).
  */
object Compact {

  /** (files, bytes, plannedPartitions) for a parquet directory, from
    * metadata only.
    */
  def plan(spark: SparkSession, path: String,
      targetBytes: Long): (Int, Long, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    (files.length, bytes, parts)
  }

  /** Rewrite `path` into ~`targetBytes` files. Returns
    * (filesBefore, bytesBefore, filesAfter, bytesAfter).
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long): (Int, Long, Int, Long) = {
    val (filesBefore, bytesBefore, parts) = plan(spark, path, targetBytes)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.getParent, p.getName + ".compacting")
    if (fs.exists(tmp)) fs.delete(tmp, true) // orphan from a prior crash
    spark.read.parquet(path).repartition(parts)
      .write.parquet(tmp.toString)
    // swap: the replacement is fully durable before the original goes
    if (!fs.delete(p, true))
      throw new java.io.IOException(s"could not remove $p for swap")
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"could not swap $tmp into $p")
    val after = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (filesBefore, bytesBefore, after.length, after.map(_.getLen).sum)
  }
}
