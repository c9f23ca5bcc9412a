package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: why is q182 12× q22 on the same pair stream? */
object Q182Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def pp = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_name"))
      .withColumn("toks", array_distinct(split(col("p_name"), " ")))
    val a = pp.select(col("p_partkey").as("lk"), col("p_brand").as("brand"),
      col("toks").as("ltoks"), col("p_type").as("ltype"))
    val b = pp.select(col("p_partkey").as("rk"), col("p_brand").as("rbrand"),
      col("toks").as("rtoks"), col("p_type").as("rtype"))
    def joined = a.join(b, col("brand") === col("rbrand") && col("lk") < col("rk"))
      .withColumn("inter", size(array_intersect(col("ltoks"), col("rtoks"))))
      .withColumn("uni", size(array_distinct(concat(col("ltoks"), col("rtoks")))))
      .withColumn("label", (col("ltype") === col("rtype")).cast("int"))
    val vPairsOnly = joined.agg(count(lit(1)))
    val vSumInter = joined.agg(sum(col("inter")), sum(col("uni")), sum(col("label")))
    val vBinNoConf = joined
      .withColumn("bin", least(floor(col("inter").cast("double") * lit(10) /
        col("uni").cast("double")), lit(9).cast("double")).cast("long"))
      .groupBy(col("bin")).agg(count(lit(1)))
    val vFull = graft.queries.ErQueries.q182Calibration(spark, sfDir)
    val vGroupInter = joined.groupBy(col("inter")).agg(count(lit(1)))
    val vGroupLabel = joined.groupBy(col("label")).agg(count(lit(1)))
    val vGroupBrand = joined.groupBy(col("brand")).agg(count(lit(1)))
    val vBinInt = joined
      .withColumn("bin", least(expr("inter * 10 DIV uni"), lit(9L)))
      .groupBy(col("bin")).agg(count(lit(1)))
    val af = a.repartition(32)
    def joinedF = af.join(b, col("brand") === col("rbrand") && col("lk") < col("rk"))
      .withColumn("inter", size(array_intersect(col("ltoks"), col("rtoks"))))
      .withColumn("uni", size(array_distinct(concat(col("ltoks"), col("rtoks")))))
      .withColumn("label", (col("ltype") === col("rtype")).cast("int"))
    val vGroupInterF = joinedF.groupBy(col("inter")).agg(count(lit(1)))
    val vSumInterF = joinedF.agg(sum(col("inter")), sum(col("uni")))
    for ((n, q) <- Seq("sumInter" -> vSumInter, "grpInter" -> vGroupInter,
        "sumInterF" -> vSumInterF, "grpInterF" -> vGroupInterF)) {
      (1 to 3).foreach(i => println(f"$n%-10s #$i ${time(q.count())}%6.2f"))
    }
    spark.stop()
  }
}
