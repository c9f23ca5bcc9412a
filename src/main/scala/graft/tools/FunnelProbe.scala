package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.{Components, Dedup}

/** Dev probe: isolate where the funnel's minhash stage spends time. */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs  ($r)")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
    val d1 = docs.join(Dedup.exactSurvivors(docs, "text", "doc_id")
      .select(col("doc_id")), Seq("doc_id"), "left_semi").cache()
    println(s"d1 rows = ${d1.count()}")
    time("raw nearDuplicates pairs") {
      Dedup.nearDuplicates(d1, "text", "doc_id", 0.7).count()
    }
    val pairs = Dedup.nearDuplicates(d1, "text", "doc_id", 0.7)
      .select(col("id_a"), col("id_b")).cache()
    println(s"edges = ${pairs.count()}")
    time("components") { Components.connectedComponents(pairs).count() }
    time("full dropNearDuplicates") {
      val r = Dedup.dropNearDuplicates(d1, "text", "doc_id", 0.7)
      try r.survivors.count() finally r.close()
    }
    time("raw nearDup on docs (q68)") {
      Dedup.nearDuplicates(docs, "text", "doc_id", 0.7).count()
    }
    spark.catalog.clearCache()
    d1.cache(); d1.count()
    time("drop @8parts cleared") {
      val r = Dedup.dropNearDuplicates(
        graft.operators.ConfScope.shufflePartitions(d1, 8),
        "text", "doc_id", 0.7)
      try r.survivors.count() finally r.close()
    }
    spark.catalog.clearCache()
    d1.cache(); d1.count()
    time("drop @32parts cleared") {
      val r = Dedup.dropNearDuplicates(
        graft.operators.ConfScope.shufflePartitions(d1, 32),
        "text", "doc_id", 0.7)
      try r.survivors.count() finally r.close()
    }
    spark.stop()
  }
}
