package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Bucketed co-located joins: writing both sides bucketed by the join
  * key must let the join plan without ANY exchange — the property that
  * turns a workload's dominant repeated shuffle into a one-time
  * write-side cost at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("same-key bucketed tables join with no exchange and match plain join") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4)
    // fixture tables are broadcast-sized, which would bypass bucketing
    // entirely ("Bucketed: false (disabled by query planner)") — force
    // the big⋈big planning path this capability exists for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)

      // same rows as the plain (shuffled) join
      val expected = orders.join(lineitem, Seq("o_orderkey"))
        .agg(count(lit(1)), sum(col("l_quantity"))).head()
      val actual = joined
        .agg(count(lit(1)), sum(col("l_quantity"))).head()
      assert(actual === expected)

      // bucket-sorted writes also plan sort-merge without a Sort node
      // on the scan side once both sides align (SortMergeJoin may still
      // sort if the planner picks hash — only assert no exchange, the
      // load-bearing property)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("orc and json round trips preserve rows; orc keeps pushdown") {
    import graft.sources.Formats
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = java.nio.file.Files.createTempDirectory("fmt").toString

    Formats.writeOrc(docs, s"$base/orc")
    val orc = Formats.readOrc(spark, s"$base/orc")
    assert(orc.count() === docs.count())
    // ORC scans push filters like parquet — the format swap keeps the
    // scan-level properties the engine relies on
    val p = orc.filter(col("n_chars") > 200)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars"), p)

    Formats.writeJsonLines(docs, s"$base/json")
    val json = Formats.readJsonLines(spark, s"$base/json", Some(docs.schema))
    assert(json.count() === docs.count())
    // content survives both round trips exactly
    assert(orc.select("doc_id", "text").except(docs.select("doc_id", "text")).count() === 0)
    assert(json.select("doc_id", "text").except(docs.select("doc_id", "text")).count() === 0)
  }

  test("partitioned layout prunes directories via PartitionFilters") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("part").toString + "/docs"
    Bucketing.writePartitioned(docs, out, Seq("lang"))

    val back = spark.read.parquet(out)
    val q = back.filter(col("lang") === "en").select("doc_id")
    val plan = q.queryExecution.executedPlan.toString
    // the lang predicate must appear as a PARTITION filter (directory
    // skip), not only a pushed data filter (which still opens files) —
    // specifically the EQUALITY predicate, not just the isnotnull guard
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(partFilters.contains("isnotnull(lang"), plan)
    assert(partFilters.contains("= en"), plan)
    // and rows survive the round trip
    val expected = docs.filter(col("lang") === "en").count()
    assert(q.count() === expected && expected > 0)
  }

  test("compaction: many small files → ~target-sized few, rows identical") {
    import graft.operators.Compact
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val path = s"$dir/t"
    val src = spark.range(0L, 2000L)
      .select(col("id"), md5(col("id").cast("string")).as("payload"))
    src.repartition(16).write.parquet(path)
    val before = src.collect().map(_.toString).sorted.toSeq
    val (filesBefore, bytesBefore, _) = Compact.plan(spark, path, Long.MaxValue)
    assert(filesBefore === 16)
    // a target far above total bytes plans a single output file
    val (_, _, filesAfter, bytesAfter) = Compact.compact(spark, path, Long.MaxValue)
    assert(filesAfter === 1)
    assert(bytesAfter > 0 && bytesBefore > 0)
    val after = spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    assert(after === before)
    // a small byte target fans back out: planned = ceil(bytes/target)
    val (_, bytesNow, planned) = Compact.plan(spark, path, (bytesAfter / 3) + 1)
    assert(bytesNow === bytesAfter && planned >= 2 && planned <= 4)
    val (_, _, files2, _) = Compact.compact(spark, path, (bytesAfter / 3) + 1)
    assert(files2 === planned)
    assert(spark.read.parquet(path).count() === 2000L)
    // orphaned .compacting sibling from a crashed run is cleared
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path.compacting"))
    val (_, _, files3, _) = Compact.compact(spark, path, Long.MaxValue)
    assert(files3 === 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path.compacting")))
  }
}
