package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r11 optimization): q182's per-pair cost. Compares the
  * shipped form (array_intersect + array_distinct(concat)) against an
  * algebraic union (|A|+|B|-inter — exact because toks is distinct on
  * both sides) and a sorted-merge intersection.
  */
object Q182Probe2 {
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
    val p = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_name"))
      .withColumn("toks", array_distinct(split(col("p_name"), " ")))
    val a = p.repartition(32)
      .select(col("p_partkey").as("lk"), col("p_brand").as("brand"),
        col("toks").as("ltoks"), col("p_type").as("ltype"))
    val b = p.select(col("p_partkey").as("rk"), col("p_brand").as("rbrand"),
      col("toks").as("rtoks"), col("p_type").as("rtype"))
    def base = a.join(b, col("brand") === col("rbrand") && col("lk") < col("rk"))
    val shipped = base
      .withColumn("inter", size(array_intersect(col("ltoks"), col("rtoks"))))
      .withColumn("uni", size(array_distinct(concat(col("ltoks"), col("rtoks")))))
      .agg(sum("inter"), sum("uni"))
    val algebraic = base
      .withColumn("inter", size(array_intersect(col("ltoks"), col("rtoks"))))
      .withColumn("uni", size(col("ltoks")) + size(col("rtoks")) - col("inter"))
      .agg(sum("inter"), sum("uni"))
    val real = graft.queries.ErQueries.q182Calibration(spark, sfDir)
    println(real.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    (1 to 3).foreach(i => println(f"real       #$i ${time(real.count())}%6.2f"))
    for ((n, q) <- Seq("shipped" -> shipped, "algebraic" -> algebraic))
      (1 to 3).foreach(i => println(f"$n%-10s #$i ${time(q.count())}%6.2f"))
    spark.stop()
  }
}
