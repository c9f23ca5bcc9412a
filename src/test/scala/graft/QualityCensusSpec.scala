package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.candidates.Blocking
import graft.graph.GraphOps
import graft.metrics.Calibration
import graft.operators.Resample
import graft.text.TextAnalysis

/** Hand-computed fixtures for the round-7 census additions: Gopher
  * quality rules, blocking quality, calibration/κ, OHLC resample, and
  * the kNN-graph structure census.
  */
class QualityCensusSpec extends SparkSpec {
  import spark.implicits._

  test("gopher signals: each rule fires on its crafted document") {
    val docs = Seq(
      // 5 words, all stopwords, all 'the': repetition + length fail,
      // mean word length 15/5 = 3 in band, stop hits 5 ≥ 2
      (1L, "the the the the the"),
      // mean word length 3/3 = 1 < 3 → mwl fail; 0 stop hits → stop fail
      (2L, "a b c"),
      // 50 words, distinct-ish, two stopwords, mean length in band → all pass
      (3L, (1 to 48).map(i => s"word$i").mkString("the a ", " ", ""))
    ).toDF("doc_id", "text")
    val g = TextAnalysis.withGopherSignals(docs)
      .select("doc_id", "g_fail_mwl", "g_fail_len", "g_fail_stop", "g_fail_rep")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toMap
    assert(g(1L) === ((false, true, false, true)))
    assert(g(2L) === ((true, true, true, true)))
    assert(g(3L) === ((false, false, false, false)))
  }

  test("blocking quality: pair counts from group cardinalities") {
    val df = Seq(("b1", "t1"), ("b1", "t1"), ("b1", "t2"), ("b2", "t1"))
      .toDF("blk", "tru")
    val r = Blocking.blockingQuality(df, "blk", "tru").collect().head
    assert(r.getAs[Long]("n_rows") === 4L)
    assert(r.getAs[Long]("cross_pairs") === 6L)
    assert(r.getAs[Long]("block_pairs") === 3L)
    assert(r.getAs[Long]("truth_pairs") === 3L)
    assert(r.getAs[Long]("covered_matches") === 1L)
    assert(r.getAs[Long]("reduction_ratio_q") === 500000000L)
    assert(r.getAs[Long]("pair_completeness_q") === 333333333L)
  }

  test("or-pair completeness: OR of keys, double-collisions deduped") {
    // t1: rows 1,2 collide in BOTH keys — must count once, not twice;
    // t2: rows 3,4 collide only in k2; t3: rows 5,6 share no key;
    // t4: singleton (no pair)
    val df = Seq(
      (1L, "t1", "x", "y"), (2L, "t1", "x", "y"),
      (3L, "t2", "a", "z"), (4L, "t2", "b", "z"),
      (5L, "t3", "c", "d"), (6L, "t3", "e", "f"),
      (7L, "t4", "g", "h")).toDF("pid", "tru", "k1", "k2")
    val r = Blocking.orPairCompleteness(df, Seq("k1", "k2"), "tru", "pid")
      .collect().head
    assert(r.getAs[Long]("n_rows") === 7L)
    assert(r.getAs[Long]("truth_pairs") === 3L)
    assert(r.getAs[Long]("covered_matches") === 2L)
    assert(r.getAs[Long]("pair_completeness_q") === 666666666L)
    // cross-truth collisions never count: same keys, different truth
    val cross = Seq((1L, "ta", "x", "y"), (2L, "tb", "x", "y"))
      .toDF("pid", "tru", "k1", "k2")
    val rc = Blocking.orPairCompleteness(cross, Seq("k1", "k2"), "tru", "pid")
      .collect().head
    assert(rc.getAs[Long]("truth_pairs") === 0L)
    assert(rc.getAs[Long]("covered_matches") === 0L)
    assert(rc.getAs[Long]("pair_completeness_q") === 0L)
  }

  test("calibration census: bins, clamping, ECE contributions") {
    val pairs = Seq((1, 2, 1), (1, 2, 0), (9, 10, 1), (1, 1, 1))
      .toDF("num", "den", "label")
    val rows = Calibration.calibrationCensus(pairs, "num", "den", "label")
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("conf_sum_q"), r.getAs[Long]("gap_q"))).toMap
    // bin 5: two half-confidence pairs, one positive → perfectly calibrated
    assert(rows(5L) === ((2L, 1L, 1000000000L, 0L)))
    // bin 9 holds 0.9 and the clamped 1.0: conf mass 1.9e9 vs 2 positives
    assert(rows(9L) === ((2L, 2L, 1900000000L, 100000000L)))
  }

  test("cohen kappa: textbook 0.4 example and degenerate zero") {
    val conf = Seq((20L, 5L, 10L, 15L)).toDF("tp", "fp", "fn", "tn")
    assert(Calibration.withCohenKappa(conf).collect().head
      .getAs[Long]("kappa_q") === 400000000L)
    val degen = Seq((7L, 0L, 0L, 0L)).toDF("tp", "fp", "fn", "tn")
    assert(Calibration.withCohenKappa(degen).collect().head
      .getAs[Long]("kappa_q") === 0L)
  }

  test("ohlc: deterministic open/close under timestamp ties") {
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2026-01-01 10:30:00")
    val df = Seq(("k", ts0, 1L, 5L), ("k", ts0, 0L, 7L), ("k", ts1, 2L, 1L))
      .toDF("k", "ts", "event_id", "cents")
    val r = Resample.ohlc(df, "k", "ts", "event_id", "cents").collect().head
    assert(r.getAs[String]("window_start") === "2026-01-01 10:00")
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("open") === 7L) // ts tie broken by event_id 0 < 1
    assert(r.getAs[Long]("close") === 1L)
    assert(r.getAs[Long]("low") === 1L)
    assert(r.getAs[Long]("high") === 7L)
    assert(r.getAs[Long]("sum_value") === 13L)
  }

  test("linear interpolation: interior gaps on the line, edges null") {
    // series 10, _, _, 40 → fills 20, 30; falling gap 40, _, -20 → 10
    // (floor division: 40 + (-60)·1/2 = 10); leading/trailing nulls stay
    val df = Seq[(String, Long, Option[Long])](
      ("k", 0L, None), ("k", 1L, Some(10L)), ("k", 2L, None),
      ("k", 3L, None), ("k", 4L, Some(40L)), ("k", 5L, None),
      ("k", 6L, Some(-20L)), ("k", 7L, None)
    ).toDF("k", "pos", "cents")
    val got = graft.operators.Interpolate
      .withLinearFill(df, "k", Seq(col("pos")), "cents")
      .orderBy(col("pos")).select(col("li_filled"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq === Seq(None, Some(10L), Some(20L), Some(30L),
      Some(40L), Some(10L), Some(-20L), None))
  }

  test("graph census: reciprocity, in-degree, isolated nodes") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (4L, 5L))
      .toDF("src", "dst")
    val r = GraphOps.degreeReciprocityCensus(edges).collect().head
    assert(r.getAs[Long]("n_nodes") === 5L)
    assert(r.getAs[Long]("n_edges") === 4L)
    assert(r.getAs[Long]("n_reciprocal") === 2L)
    assert(r.getAs[Long]("max_in_degree") === 1L)
    assert(r.getAs[Long]("n_receiving") === 4L)
    assert(r.getAs[Long]("n_isolated") === 1L)
  }
}
