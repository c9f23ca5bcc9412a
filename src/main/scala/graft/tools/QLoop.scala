package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sources.Tables

/** Dev tool: loop one census query in a single JVM to separate plan cost
  * from run-to-run variance (codegen warm-up, GC, host contention).
  */
object QLoop {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // legacy round-4 census: cached band-key self-join + cached two-leg
    // verify — for comparison against the current q32
    def legacy(): Unit = {
      val d = Tables.loadFanned(spark, sfDir, "documents")
        .filter(col("text").isNotNull)
      val keys = Dedup.lshBandKeys(d, "text", "doc_id").cache()
      val a = keys.select(col("band"), col("key"), col("doc_id").as("id_a"))
      val b = keys.select(col("band").as("band_b"), col("key").as("key_b"),
        col("doc_id").as("id_b"))
      val cands = a.join(b, col("band") === col("band_b") &&
          col("key") === col("key_b") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct().cache()
      val sh = d.select(col("doc_id"),
        array_distinct(Dedup.shingles(col("text"))).as("__sh")).cache()
      val ver = cands
        .join(sh.select(col("doc_id").as("id_a"), col("__sh").as("sh_a"))
          .hint("shuffle_hash"), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("__sh").as("sh_b"))
          .hint("shuffle_hash"), "id_b")
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_distinct(concat(col("sh_a"), col("sh_b")))).cast("double"))
        .filter(col("jaccard") >= 0.7)
      cands.agg(count(lit(1))).crossJoin(ver.agg(count(lit(1)))).count()
    }

    (1 to 4).foreach { i =>
      spark.catalog.clearCache()
      println(f"[qloop] q32 current  #$i ${time(graft.queries.PipelineQueries.q32NearDups(spark, sfDir).count())}%6.2f s")
    }
    (1 to 4).foreach { i =>
      spark.catalog.clearCache()
      println(f"[qloop] q32 legacy   #$i ${time(legacy())}%6.2f s")
    }
    (1 to 2).foreach { i =>
      spark.catalog.clearCache()
      println(f"[qloop] q32 current  again #$i ${time(graft.queries.PipelineQueries.q32NearDups(spark, sfDir).count())}%6.2f s")
    }

    // support-search generators at a scaled source (args: multiplier)
    args.headOption.map(_.toInt).foreach { m =>
      val part0 = Tables.load(spark, sfDir, "part")
      val part = part0.crossJoin(spark.range(m).select(col("id").as("__rep")))
        .select(
          (col("p_partkey") * m + col("__rep")).as("id"),
          regexp_replace(col("p_name"), lit("(\\S+)"),
            concat(lit("$1r"), col("__rep"))).as("name"),
          concat(col("p_brand"), lit("r"), col("__rep")).as("brand"),
          col("p_type").as("ptype"), col("p_size").cast("string").as("psize"))
        .repartition(32).cache()
      println(s"[qloop] scaled part rows: ${part.count()}")
      val model = graft.matcher.TokenCosineModel()
      val probe = part.filter(col("id") === 0L)
      def search(gen: graft.candidates.CandidateGenerator): Unit =
        graft.candidates.Candidates.findCandidates(probe, part,
          probeIsLeft = true, findPositives = true, model = model,
          numCandidates = 5, gen = gen).count()
      def best3(gen: graft.candidates.CandidateGenerator): Double =
        (1 to 3).map(_ => time(search(gen))).min
      println(f"[qloop] support cross      ${best3(graft.candidates.CrossJoinGenerator)}%6.2f s")
      println(f"[qloop] support blocked    ${best3(graft.candidates.LshBlockingGenerator())}%6.2f s")
      val keyed = graft.candidates.LshBlockingGenerator.withBandKeys(part).cache()
      println(f"[qloop] prekey build       ${time(keyed.count())}%6.2f s (once per batch)")
      val gen = graft.candidates.LshBlockingGenerator(prekeyed = Map(part -> keyed))
      println(f"[qloop] support prekeyed   ${best3(gen)}%6.2f s")
      keyed.unpersist(true)
    }
    spark.stop()
  }
}
