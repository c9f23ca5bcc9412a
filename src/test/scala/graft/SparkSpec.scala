package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // set from birth, not at first events read: suites run in parallel
    // threads, and a thread without an active session resolves parquet
    // schemas against DEFAULT conf values (ts → TIMESTAMP_NTZ flake)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // managed tables (BucketingSpec) must never land in the repo tree
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()
}
