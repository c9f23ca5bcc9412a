package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sources.Tables

/** Ad-hoc stage profiler for slow catalog queries (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val d = Tables.load(spark, sfDir, "documents")
    time("docs count")(d.count())
    time("tokens")(d.select(split(col("text"), " ")).count())
    time("shingles")(d.select(Dedup.shingles(col("text"))).count())
    time("shingles distinct")(
      d.select(array_distinct(Dedup.shingles(col("text")))).count())
    time("one minhash")(d.select(Dedup.minhashColumn(col("text"), 0)).count())
    time("4-hash signature")(
      Dedup.withMinhashSignature(d, "text", 4).count())
    time("band keys")(Dedup.lshBandKeys(d, "text", "doc_id").count())
    val cands = Dedup.lshCandidatePairs(d, "text", "doc_id")
    time("candidate pairs")(cands.count())
    time("candidate pairs again")(cands.count())
    // legacy self-join shape for comparison
    def joinCands(): Long = {
      val keys = Dedup.lshBandKeys(d, "text", "doc_id").cache()
      val a = keys.select(col("band"), col("key"), col("doc_id").as("id_a"))
      val b = keys.select(col("band").as("band_b"), col("key").as("key_b"),
        col("doc_id").as("id_b"))
      val n = a.join(b, col("band") === col("band_b") && col("key") === col("key_b") &&
          col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct().count()
      keys.unpersist(true)
      n
    }
    time("candidate pairs (join)")(joinCands())
    time("verified near-dups")(
      Dedup.nearDuplicates(d, "text", "doc_id", 0.7).count())
    time("verified near-dups 2nd")(
      Dedup.nearDuplicates(d, "text", "doc_id", 0.7).count())
    time("q32 census full")(graft.queries.PipelineQueries
      .q32NearDups(spark, sfDir).count())
    spark.catalog.clearCache()
    time("q32 census full 2nd")(graft.queries.PipelineQueries
      .q32NearDups(spark, sfDir).count())
    spark.catalog.clearCache()
    // melt verify vs two-leg join verify (uncached sh both)
    def twoLegVerify(): Long = {
      val c = Dedup.lshCandidatePairs(d, "text", "doc_id")
      val sh = d.select(col("doc_id"), array_distinct(Dedup.shingles(col("text"))).as("__sh"))
      c.join(sh.select(col("doc_id").as("id_a"), col("__sh").as("sh_a")).hint("shuffle_hash"), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("__sh").as("sh_b")).hint("shuffle_hash"), "id_b")
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_distinct(concat(col("sh_a"), col("sh_b")))).cast("double"))
        .filter(col("jaccard") >= 0.7).count()
    }
    def meltVerify(): Long = {
      val c = Dedup.lshCandidatePairs(d, "text", "doc_id")
      Dedup.verifyJaccard(c, d, "text", "doc_id", 0.7).count()
    }
    time("verify two-leg nocache")(twoLegVerify())
    time("verify two-leg nocache 2")(twoLegVerify())
    time("verify melt")(meltVerify())
    time("verify melt 2")(meltVerify())

    // per-job attribution for the explain loop
    val jobLog = new scala.collection.mutable.ArrayBuffer[(Int, Long, String)]
    val starts = new scala.collection.mutable.HashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.synchronized {
          starts(j.jobId) = (System.nanoTime(),
            Option(j.properties.getProperty("spark.job.description"))
              .orElse(Option(j.properties.getProperty("callSite.short"))).getOrElse("?"))
        }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(j.jobId).foreach { case (t0, d) =>
            jobLog += ((j.jobId, System.nanoTime() - t0, d))
          }
        }
    })

    // explain stage costs
    val part = Tables.load(spark, sfDir, "part").select(
      col("p_partkey").as("id"), col("p_name").as("name"),
      col("p_brand").as("brand"), col("p_type").as("ptype"),
      col("p_size").cast("string").as("psize"))
    val l = part.filter(col("id") === 0)
    val t0 = System.nanoTime()
    val e = new graft.explain.CertaExplainer(part, part)
      .explain(l, l, graft.matcher.TokenCosineModel(), numTriangles = 10)
    println(f"[profile] explain() driver loop        ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    time("saliency collect")(e.saliency.count())
    time("pss collect")(e.pss.count())
    time("cfSummary collect")(e.cfSummary.count())
    val cf = e.cfExamples
    val tPlan = System.nanoTime()
    cf.queryExecution.executedPlan
    println(f"[profile] cfExamples planning           ${(System.nanoTime() - tPlan) / 1e9}%8.2f s")
    time("cfExamples collect")(cf.count())
    time("triangles collect")(e.triangles.count())

    println(f"[profile] ---- explain jobs: ${jobLog.size} total, slowest first ----")
    jobLog.sortBy(-_._2).take(25).foreach { case (id, ns, desc) =>
      println(f"[profile] job $id%4d ${ns / 1e9}%8.2f s  ${desc.take(110)}")
    }
    spark.stop()
  }
}
