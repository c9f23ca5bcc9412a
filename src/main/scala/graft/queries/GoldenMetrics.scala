package graft.queries

/** Frozen golden outputs of the A13/A14 explanation-quality metrics on
  * the SF-invariant nation⋈region fixture (see
  * [[ErQueries.goldenLabeledPairs]]) — the q60-q63 recipe applied to
  * the last two spec-only §2 rows. A13's numbers are pure count/hash
  * arithmetic (exact doubles); A14's come through an MLlib
  * MinMaxScaler+LinearRegression fit pinned to a deterministic
  * single-partition row order and quantized to 1e-9 longs.
  *
  * Regenerate DELIBERATELY with `sbt "runMain graft.tools.GoldenGen"`,
  * which asserts the three SF dirs produce identical rows before
  * printing the new constants.
  */
object GoldenMetrics {

  // generated 2026-08-14 by GoldenGen; identical across sf0.001/0.01/0.1
  val faithfulness: Seq[(String, Double)] = Seq(
    ("auc", 0.32956190510933375),
    ("f1@0.1", 0.628140703517588),
    ("f1@0.2", 0.6842105263157895),
    ("f1@0.33", 0.6842105263157895),
    ("f1@0.5", 0.33333333333333337),
    ("f1@0.7", 0.2758620689655173),
    ("f1@0.9", 0.0))

  val confidence: Seq[(String, Long)] = Seq(
    ("fold0_mae_q", 68966529L),
    ("fold1_mae_q", 61497729L),
    ("fold2_mae_q", 60756467L),
    ("fold3_mae_q", 60023265L),
    ("fold4_mae_q", 61528710L),
    ("max_err_q", 68966529L),
    ("mean_mae_q", 62554540L))

  // (triangle, n_elements, n_edges, md5(hasse dot)) per q174 lattice
  val lattice: Seq[(String, Long, Long, String)] = Seq(
    ("0@0 1@0 0@14", 3L, 2L, "dd15edec9cdb285097dbc80fe3273823"),
    ("0@0 1@0 0@19", 3L, 2L, "dd15edec9cdb285097dbc80fe3273823"),
    ("0@0 1@0 0@9", 3L, 2L, "dd15edec9cdb285097dbc80fe3273823"))

  // string-literal cast: DuckDB parses a bare numeric literal through
  // DECIMAL, which can land one ULP off the Scala double; a quoted
  // string goes through strtod and round-trips exactly
  private def d(v: Double): String = s"CAST('$v' AS DOUBLE)"
  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  val faithfulnessSql: String =
    faithfulness.map { case (m, v) => s"(${q(m)}, ${d(v)})" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(metric, value) ORDER BY metric")

  val confidenceSql: String =
    confidence.map { case (m, v) =>
        s"(${q(m)}, CAST($v AS BIGINT))" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(metric, value_q) ORDER BY metric")

  // A9-A12 CF-quality metrics of the golden explanation (q175);
  // clean rationals — 1/6, 2/3, 8/9, 1 — quantized at 1e-9
  val cfMetrics: Seq[(String, Long)] = Seq(
    ("diversity_q", 166666667L),
    ("proximity_q", 666666667L),
    ("sparsity_q", 888888889L),
    ("validity_q", 1000000000L))

  val cfMetricsSql: String =
    cfMetrics.map { case (m, v) =>
        s"(${q(m)}, CAST($v AS BIGINT))" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(metric, value_q) ORDER BY metric")

  // q176: saliency of the augmentation-fallback explanation (equals
  // the untruncated full-26-support run — the PARITY layer-B config)
  val augSaliency: Seq[(String, Double)] = Seq(
    ("ltable_grp", 0.7000000000000001),
    ("ltable_name", 0.775),
    ("ltable_region", 0.825),
    ("rtable_grp", 0.7000000000000001),
    ("rtable_name", 0.775),
    ("rtable_region", 0.825))

  val augSaliencySql: String =
    augSaliency.map { case (a, v) => s"(${q(a)}, ${d(v)})" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(attribute, saliency) ORDER BY attribute")

  // q177: (u, v, w, identity, symmetry, transitivity) flags — all
  // true: the deterministic cosine model is symmetric and transitive
  // on this fixture, so the probes PASSING is itself the assertion
  val invariants: Seq[(String, String, String, Long, Long, Long)] = Seq(
    ("0@0", "1@0", "0@13", 1L, 1L, 1L),
    ("0@0", "1@0", "0@14", 1L, 1L, 1L),
    ("0@0", "1@0", "0@19", 1L, 1L, 1L),
    ("0@0", "1@0", "0@23", 1L, 1L, 1L),
    ("0@0", "1@0", "0@7", 1L, 1L, 1L),
    ("0@0", "1@0", "0@9", 1L, 1L, 1L),
    ("1@0", "0@0", "1@14", 1L, 1L, 1L),
    ("1@0", "0@0", "1@17", 1L, 1L, 1L),
    ("1@0", "0@0", "1@23", 1L, 1L, 1L),
    ("1@0", "0@0", "1@24", 1L, 1L, 1L))

  val invariantsSql: String =
    invariants.map { case (u, v, w, i, sy, tr) =>
        s"(${q(u)}, ${q(v)}, ${q(w)}, CAST($i AS BIGINT), " +
          s"CAST($sy AS BIGINT), CAST($tr AS BIGINT))" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(u, v, w, identity, symmetry, transitivity) ORDER BY u, v, w")

  // q179: (method, found, n, detail) per evidence-CF baseline
  val evidenceCf: Seq[(String, Long, Long, String)] = Seq(
    ("dice", 1L, 10L, "b6a056ae5469511faaf29b0ae8cb25d7"),
    ("limec", 1L, 3L, "ltable_grp/ltable_name/ltable_region"),
    ("shapc", 1L, 3L, "ltable_grp/ltable_name/ltable_region"))

  val evidenceCfSql: String =
    evidenceCf.map { case (m, f, n, dt) =>
        s"(${q(m)}, CAST($f AS BIGINT), CAST($n AS BIGINT), ${q(dt)})" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(method, found, n, detail) ORDER BY method")

  val latticeSql: String =
    lattice.map { case (t, ne, ned, h) =>
        s"(${q(t)}, CAST($ne AS BIGINT), CAST($ned AS BIGINT), ${q(h)})" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(triangle, n_elements, n_edges, dot_md5) ORDER BY triangle")
}
