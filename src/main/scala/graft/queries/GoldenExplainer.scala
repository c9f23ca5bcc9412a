package graft.queries

/** Frozen golden outputs of the live explainer on the SF-invariant
  * nation⋈region fixture (see [[ErQueries.goldenSource]]). The fixture
  * model (TokenCosineModel) is deterministic md5/token arithmetic and
  * every explainer stage is seeded, so these constants are exact — they
  * are the single source of truth for BOTH the DuckDB oracle (a VALUES
  * literal the driver hash-checks q60-q62 against) and the
  * GoldenExplainerSpec recompute gate.
  *
  * Regenerate DELIBERATELY with `sbt "runMain graft.tools.GoldenGen"`,
  * which also asserts the three SF dirs produce identical rows before
  * printing the new constants.
  */
object GoldenExplainer {

  // generated 2026-08-13 by GoldenGen; identical across sf0.001/0.01/0.1
  val saliency: Seq[(String, Double)] = Seq(
    ("ltable_grp", 0.7058823529411765),
    ("ltable_name", 0.7647058823529412),
    ("ltable_region", 0.8823529411764706),
    ("rtable_grp", 0.5882352941176471),
    ("rtable_name", 0.7058823529411765),
    ("rtable_region", 0.7058823529411765))

  val pss: Seq[(String, Double)] = Seq(
    ("ltable_grp", 0.0),
    ("ltable_name", 0.0),
    ("ltable_name/ltable_grp", 0.0),
    ("ltable_name/ltable_region", 0.3),
    ("ltable_region", 0.0),
    ("ltable_region/ltable_grp", 0.2),
    ("rtable_grp", 0.0),
    ("rtable_name", 0.0),
    ("rtable_name/rtable_grp", 0.0),
    ("rtable_name/rtable_region", 0.2),
    ("rtable_region", 0.0),
    ("rtable_region/rtable_grp", 0.0))

  val triangles: Seq[(String, String, String)] = Seq(
    ("0@0", "1@0", "0@13"),
    ("0@0", "1@0", "0@14"),
    ("0@0", "1@0", "0@19"),
    ("0@0", "1@0", "0@23"),
    ("0@0", "1@0", "0@7"),
    ("0@0", "1@0", "0@9"),
    ("1@0", "0@0", "1@14"),
    ("1@0", "0@0", "1@17"),
    ("1@0", "0@0", "1@23"),
    ("1@0", "0@0", "1@24"))

  // generated 2026-08-13 by GoldenGen; identical across sf0.001/0.01/0.1
  val baselines: Seq[(String, String, Double)] = Seq(
    ("landmark", "ltable_grp", 0.43789778429251647),
    ("landmark", "ltable_name", 0.2105803501507792),
    ("landmark", "ltable_region", 0.21145250337849247),
    ("mojito", "ltable_grp", 0.17161318103852333),
    ("mojito", "ltable_name", 0.17758887475476978),
    ("mojito", "ltable_region", 0.17145881404484037),
    ("shap", "ltable_grp", 0.4553418012614796),
    ("shap", "ltable_name", 0.2723290993692602),
    ("shap", "ltable_region", 0.2723290993692602))

  // string-literal cast: DuckDB parses a bare numeric literal through
  // DECIMAL, which can land one ULP off the Scala double; a quoted
  // string goes through strtod and round-trips exactly
  private def d(v: Double): String = s"CAST('$v' AS DOUBLE)"
  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  val saliencySql: String =
    saliency.map { case (a, v) => s"(${q(a)}, ${d(v)})" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(attribute, saliency) ORDER BY attribute")

  val pssSql: String =
    pss.map { case (a, v) => s"(${q(a)}, ${d(v)})" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(attrSet, pos) ORDER BY attrSet")

  val trianglesSql: String =
    triangles.map { case (u, v, w) => s"(${q(u)}, ${q(v)}, ${q(w)})" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(u, v, w) ORDER BY u, v, w")

  val baselinesSql: String =
    baselines.map { case (m, a, v) => s"(${q(m)}, ${q(a)}, ${d(v)})" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(method, attribute, weight) ORDER BY method, attribute")
}
