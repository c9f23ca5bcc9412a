package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev check: explain() latency at the reference-default numTriangles
  * on the sf0.1 sources (the EvalDriver per-row workload shape).
  */
object ExplainTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val part = graft.sources.Tables.load(spark, sfDir, "part").select(
      col("p_partkey").as("id"), col("p_name").as("name"),
      col("p_brand").as("brand"), col("p_type").as("ptype"),
      col("p_size").cast("string").as("psize"))
    val model = graft.matcher.TokenCosineModel()
    val explainer = new graft.explain.CertaExplainer(part, part)
    for (n <- Seq(10, 100); rep <- 1 to 2) {
      val l = part.filter(col("id") === (rep - 1).toLong)
      val t0 = System.nanoTime()
      val e = explainer.explain(l, l, model, numTriangles = n)
      val rows = if (e.saliency.columns.isEmpty) 0L else e.saliency.count()
      println(f"[explain-timing] numTriangles=$n%3d rep=$rep ${(System.nanoTime() - t0) / 1e9}%7.2f s  saliency=$rows rows")
    }
    spark.stop()
  }
}
