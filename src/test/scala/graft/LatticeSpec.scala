package graft

import org.apache.spark.sql.functions._
import graft.explain.Lattice
import graft.metrics.ConfidenceMetrics

/** Lattice debug assembly + dot emitter, and the confidence-indication
  * regression metric.
  */
class LatticeSpec extends SparkSpec {

  import spark.implicits._

  test("lattice assembles per triangle and emits a Hasse dot graph") {
    val preds = Seq(
      ("t1", Seq("a"), 0.8), ("t1", Seq("b"), 0.3), ("t1", Seq("a", "b"), 0.1),
      ("t2", Seq("a"), 0.9)
    ).toDF("triangle", "alteredAttributes", "match_score")
    val lattices = Lattice.fromPredictions(preds, originalScore = 0.95,
      allAttributes = Set("a", "b", "c"))
    assert(lattices.map(_.triangle).toSet === Set("t1", "t2"))
    val l1 = lattices.find(_.triangle == "t1").get
    assert(l1.bottom === Set.empty)
    assert(l1.top === Set("a", "b", "c"))
    val dot = l1.hasse
    assert(dot.startsWith("digraph G {"))
    assert(dot.contains("rankdir=BT"))
    // the empty set covers {a} and {b}, and {a} covers {a/b}
    assert(dot.contains("\"{}\" -> \"{a}\""))
    assert(dot.contains("\"{a}\" -> \"{a/b}\""))
    // flipped sets render red, surviving sets green
    assert(dot.contains("\"{a/b}\" [color=red];"))
    assert(dot.contains("\"{a}\" [color=green];"))
    // dot sink round-trip
    val p = java.nio.file.Files.createTempFile("lat", ".dot")
    l1.writeDot(p.toString)
    assert(java.nio.file.Files.readString(p).startsWith("digraph"))
  }

  test("confidence indication: saliency perfectly linear in confidence → ~0 MAE") {
    val rows = (0 until 100).map { i =>
      val s = i / 100.0
      (s, 1.0 - s, 0.5 + s / 2.0) // confidence = 0.5 + sal1/2
    }
    val df = rows.toDF("sal1", "sal2", "confidence")
    val res = ConfidenceMetrics.confidenceIndication(df, Seq("sal1", "sal2"), nFolds = 3)
    assert(res.meanMae < 0.05)
    assert(res.foldMaes.size === 3)
  }

  test("per-row faithfulness ablates each pair's own top attributes") {
    import org.apache.spark.sql.DataFrame
    val pairs = Seq(
      (0L, 0L, "alpha beta", "alpha beta", 1),
      (1L, 1L, "gamma delta x", "gamma delta y", 1)
    ).toDF("ltable_id", "rtable_id", "ltable_name", "rtable_name", "label")
    // pair 0 ranks ltable_name first; pair 1 ranks rtable_name first
    val saliency = Seq(
      (0L, 0L, "ltable_name", 0.9), (0L, 0L, "rtable_name", 0.1),
      (1L, 1L, "ltable_name", 0.2), (1L, 1L, "rtable_name", 0.8)
    ).toDF("ltable_id", "rtable_id", "attribute", "score")
    val scorer = (df: DataFrame) => graft.matcher.TokenCosineModel().predict(df)
    val (scores, auc) = graft.metrics.SaliencyMetrics.faithfulnessAucPerRow(
      pairs, saliency, scorer, Seq("ltable_name", "rtable_name"),
      Seq(0.1, 0.5, 0.9))
    // t=0.1 → top-0: nothing ablated, both pairs still predicted match
    assert(scores.head === 1.0)
    // t=0.5 → top-1 per pair blanked → cosine drops to 0 → no matches
    assert(scores(1) === 0.0)
    assert(auc >= 0.0 && auc <= 1.0)
  }
}
