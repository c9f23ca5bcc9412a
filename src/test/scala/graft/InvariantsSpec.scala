package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.eval.EvalDriver
import graft.explain.Invariants
import graft.matcher.TokenCosineModel
import graft.perturb.Augment

/** Specs for the matcher-invariant probes (G6), the evaluation driver
  * (§3.2) and the augmentation generator (G1).
  */
class InvariantsSpec extends SparkSpec {

  import spark.implicits._

  private def lsource: DataFrame = Seq(
    (0L, "alpha beta gamma", "rome"),
    (1L, "delta epsilon zeta", "paris")
  ).toDF("id", "name", "city")

  private def rsource: DataFrame = Seq(
    (0L, "alpha beta gamma", "rome"),
    (2L, "nu xi omicron", "london")
  ).toDF("id", "name", "city")

  test("invariant probes: cosine matcher is identity/symmetry-consistent") {
    val tri = Seq(("0@0", "1@0", "0@1")).toDF("u", "v", "w")
    val checked = Invariants.checkAll(tri, lsource, rsource, TokenCosineModel())
    val row = checked.head()
    // cosine is reflexive and symmetric by construction
    assert(row.getAs[Boolean]("identity"))
    assert(row.getAs[Boolean]("symmetry"))
    // u~v match, v~w nomatch, u~w nomatch → matches=1 → transitive
    assert(row.getAs[Boolean]("transitivity"))
  }

  test("G1 augmentation: fan-out = 2·Σ(tokens-1) per attribute, fresh ids") {
    val one = Seq((7L, "a b c", "x")).toDF("id", "name", "city")
    val gen = Augment.generateSubsequences(one, startId = 100L).cache()
    // name "a b c": cuts 1,2 → 4 variants; city "x": no cut → 0
    assert(gen.count() === 4)
    val names = gen.select("name").as[String].collect().toSet
    assert(names === Set("b c", "a", "c", "a b"))
    val ids = gen.select("id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(100L, 101L, 102L, 103L))
  }

  test("eval driver computes per-pair CF metrics with memoized sinks") {
    val out = java.nio.file.Files.createTempDirectory("evalcf").toString
    val pairs = Seq((0L, 0L, 1)).toDF("ltable_id", "rtable_id", "label")
    val metrics = EvalDriver.evalCf(lsource, rsource, pairs,
      TokenCosineModel(), out, numTriangles = 4, maxRows = 1)
    val row = metrics.head()
    assert(row.getAs[Double]("latencySec") > 0.0)
    // validity of CERTA cf examples is 1.0 by construction (all flipped)
    if (row.getAs[Long]("nCf") > 0)
      assert(row.getAs[Double]("validity") === 1.0)
  }

  test("saliency eval driver emits long-form scores for all methods") {
    val out = java.nio.file.Files.createTempDirectory("evalsal").toString
    val pairs = Seq((0L, 0L, 1)).toDF("ltable_id", "rtable_id", "label")
    val df = EvalDriver.evalSaliency(lsource, rsource, pairs,
      TokenCosineModel(), out, numTriangles = 4, maxRows = 1)
    val methods = df.select("method").distinct()
      .collect().map(_.getString(0)).toSet
    assert(methods.contains("mojito") && methods.contains("landmark"))
    assert(df.filter(org.apache.spark.sql.functions.col("latency_sec") <= 0).count() === 0)
  }
}
