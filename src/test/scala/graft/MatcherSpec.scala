package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.matcher.{MLlibMatcher, TokenCosineModel}
import graft.metrics.SaliencyMetrics
import graft.schema.PairSchema
import graft.sources.ErSources

/** Trainable matcher lifecycle (train → predict → persist → reload) and
  * the CSV source/sink round-trip.
  */
class MatcherSpec extends SparkSpec {

  import spark.implicits._

  private def labeledPairs: DataFrame = {
    val rows = (0 until 40).map { i =>
      val name = s"item alpha$i beta$i"
      if (i % 2 == 0) // matches: same tokens both sides
        (s"$name common tokens", s"$name common tokens", 1)
      else // non-matches: disjoint
        (s"$name left only", s"completely different right $i", 0)
    }
    rows.toDF("lname", "rname", "label")
      .select(col("lname").as("ltable_name"), col("rname").as("rtable_name"),
        col("label"))
  }

  test("MLlib matcher learns the similarity → label mapping") {
    val m = MLlibMatcher.train(labeledPairs)
    val scored = m.predict(labeledPairs)
    assert(scored.columns.contains("match_score"))
    assert(scored.columns.contains("nomatch_score"))
    // separable by construction → F1 = 1.0
    assert(SaliencyMetrics.f1(scored) === 1.0)
    // score contract: two probabilities summing to 1
    val r = scored.select(col("match_score") + col("nomatch_score")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
  }

  test("MLP neural matcher learns the mapping, deterministically") {
    val m1 = MLlibMatcher.trainMlp(labeledPairs)
    val scored = m1.predict(labeledPairs)
    // separable by construction → the net must reach F1 = 1.0
    assert(SaliencyMetrics.f1(scored) === 1.0)
    val r = scored.select(col("match_score") + col("nomatch_score")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    // seeded L-BFGS: retraining on the same frame reproduces the exact
    // weights — eval fixtures and goldens stay stable across runs
    val m2 = MLlibMatcher.trainMlp(labeledPairs)
    val s1 = m1.predict(labeledPairs).select("match_score").as[Double].collect()
    val s2 = m2.predict(labeledPairs).select("match_score").as[Double].collect()
    assert(s1.toSeq === s2.toSeq)
  }

  test("neural matcher drives the explainer end-to-end") {
    val lsource = Seq(
      (0L, "alpha beta gamma", "rome"),
      (1L, "delta epsilon zeta", "paris"),
      (2L, "eta theta iota", "oslo")
    ).toDF("id", "name", "city")
    val rsource = Seq(
      (0L, "alpha beta gamma", "rome"),
      (1L, "kappa lambda mu", "cairo"),
      (2L, "eta theta iota", "oslo")
    ).toDF("id", "name", "city")
    // train on pairs assembled from the sources themselves (diagonal
    // matches, off-diagonal non-matches)
    val schema = PairSchema.default
    val train = {
      val l = schema.renameWithPrefix(lsource, schema.lprefix)
      val r = schema.renameWithPrefix(rsource, schema.rprefix)
      l.crossJoin(r).withColumn("label",
        when(col(schema.lid) === col(schema.rid), 1).otherwise(0))
    }
    val mlp = MLlibMatcher.trainMlp(train)
    val e = new graft.explain.CertaExplainer(lsource, rsource)
      .explain(lsource.filter(col("id") === 0L),
        rsource.filter(col("id") === 0L), mlp, numTriangles = 4)
    assert(e.saliency.columns.nonEmpty)
    assert(e.saliency.count() === 4) // one per prefixed attribute
  }

  test("load-else-train lifecycle persists and reloads the pipeline") {
    val path = java.nio.file.Files.createTempDirectory("mllib").toString + "/model"
    val m1 = MLlibMatcher.loadOrTrain(path, labeledPairs)
    val m2 = MLlibMatcher.loadOrTrain(path,
      sys.error("must not retrain on second call"))
    val s1 = m1.predict(labeledPairs).select("match_score").as[Double].collect()
    val s2 = m2.predict(labeledPairs).select("match_score").as[Double].collect()
    assert(s1.toSeq === s2.toSeq)
  }

  test("CSV sink/source round-trips an explanation frame") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString + "/out"
    val df = Seq(("a", 0.5), ("b", 1.0)).toDF("attribute", "saliency")
    ErSources.writeCsv(df, dir)
    val back = ErSources.readCsv(spark, dir)
    assert(back.orderBy("attribute").collect().map(r =>
      (r.getString(0), r.getDouble(1))).toSeq === Seq(("a", 0.5), ("b", 1.0)))
  }
}
