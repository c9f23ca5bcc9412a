package graft.queries

/** Per-SF frozen golden outputs of the bench-scale LIVE explainer
  * (q25-q28 on `part`, see [[ErQueries.explained]]). Unlike
  * [[GoldenExplainer]]'s SF-invariant nation⋈region fixture, the
  * `part` support/candidate structure grows with scale factor, so each
  * SF dir gets its own frozen block. Every explainer stage is
  * seeded/hash-deterministic (verified by two identical back-to-back
  * GoldenGen runs), so these constants are exact: they become VALUES
  * oracles the driver hash-checks q25-q28 against at the verify SF.
  *
  * Regenerate DELIBERATELY with `sbt "runMain graft.tools.GoldenGen"`
  * whenever the driver regenerates `/root/testdata` — the constants
  * encode the current fixture content.
  */
object GoldenLive {

  final case class LiveGolden(
      saliency: Seq[(String, Double)],
      pss: Seq[(String, Double)],
      triangles: Seq[(String, String, String)],
      baselines: Seq[(String, String, Double)])

  // generated 2026-08-14 by GoldenGen
  val bySf: Map[String, LiveGolden] = Map(
  // --- sf0.001 ---
  "sf0.001" -> LiveGolden(
    saliency = Seq(
      ("ltable_brand", 0.5),
      ("ltable_name", 0.625),
      ("ltable_psize", 0.5),
      ("ltable_ptype", 0.5),
      ("rtable_brand", 0.5),
      ("rtable_name", 0.625),
      ("rtable_psize", 0.5),
      ("rtable_ptype", 0.5)),
    pss = Seq(
      ("ltable_brand", 0.0),
      ("ltable_brand/ltable_psize", 0.0),
      ("ltable_brand/ltable_ptype", 0.0),
      ("ltable_brand/ltable_ptype/ltable_psize", 0.0),
      ("ltable_name", 0.0),
      ("ltable_name/ltable_brand", 0.0),
      ("ltable_name/ltable_brand/ltable_psize", 0.5),
      ("ltable_name/ltable_brand/ltable_ptype", 0.5),
      ("ltable_name/ltable_psize", 0.0),
      ("ltable_name/ltable_ptype", 0.0),
      ("ltable_name/ltable_ptype/ltable_psize", 0.5),
      ("ltable_psize", 0.0),
      ("ltable_ptype", 0.0),
      ("ltable_ptype/ltable_psize", 0.0),
      ("rtable_brand", 0.0),
      ("rtable_brand/rtable_psize", 0.0),
      ("rtable_brand/rtable_ptype", 0.0),
      ("rtable_brand/rtable_ptype/rtable_psize", 0.0),
      ("rtable_name", 0.0),
      ("rtable_name/rtable_brand", 0.0),
      ("rtable_name/rtable_brand/rtable_psize", 0.5),
      ("rtable_name/rtable_brand/rtable_ptype", 0.5),
      ("rtable_name/rtable_psize", 0.0),
      ("rtable_name/rtable_ptype", 0.0),
      ("rtable_name/rtable_ptype/rtable_psize", 0.5),
      ("rtable_psize", 0.0),
      ("rtable_ptype", 0.0),
      ("rtable_ptype/rtable_psize", 0.0)),
    triangles = Seq(
      ("0@0", "1@0", "0@102"),
      ("0@0", "1@0", "0@12"),
      ("0@0", "1@0", "0@120"),
      ("0@0", "1@0", "0@122"),
      ("0@0", "1@0", "0@125"),
      ("1@0", "0@0", "1@109"),
      ("1@0", "0@0", "1@119"),
      ("1@0", "0@0", "1@120"),
      ("1@0", "0@0", "1@128"),
      ("1@0", "0@0", "1@138")),
    baselines = Seq(
      ("landmark", "ltable_brand", 0.2648293699780023),
      ("landmark", "ltable_name", 0.2754368930248056),
      ("landmark", "ltable_psize", 0.1397795058211491),
      ("landmark", "ltable_ptype", 0.14041828348369945),
      ("mojito", "ltable_brand", 0.25304879000995356),
      ("mojito", "ltable_name", 0.13939752283491402),
      ("mojito", "ltable_psize", 0.10710314594890791),
      ("mojito", "ltable_ptype", 0.16689398759522517),
      ("shap", "ltable_brand", 0.31417491380706064),
      ("shap", "ltable_name", 0.31417491380706064),
      ("shap", "ltable_psize", 0.18582508619293944),
      ("shap", "ltable_ptype", 0.18582508619293944))),
  // --- sf0.01 ---
  "sf0.01" -> LiveGolden(
    saliency = Seq(
      ("ltable_brand", 0.5),
      ("ltable_name", 0.5),
      ("ltable_psize", 0.5),
      ("ltable_ptype", 0.5),
      ("rtable_brand", 0.5),
      ("rtable_name", 0.5),
      ("rtable_psize", 0.5),
      ("rtable_ptype", 0.5)),
    pss = Seq(
      ("ltable_brand", 0.0),
      ("ltable_brand/ltable_psize", 0.0),
      ("ltable_brand/ltable_ptype", 0.0),
      ("ltable_brand/ltable_ptype/ltable_psize", 0.5),
      ("ltable_name", 0.0),
      ("ltable_name/ltable_brand", 0.0),
      ("ltable_name/ltable_brand/ltable_psize", 0.5),
      ("ltable_name/ltable_brand/ltable_ptype", 0.5),
      ("ltable_name/ltable_psize", 0.0),
      ("ltable_name/ltable_ptype", 0.0),
      ("ltable_name/ltable_ptype/ltable_psize", 0.5),
      ("ltable_psize", 0.0),
      ("ltable_ptype", 0.0),
      ("ltable_ptype/ltable_psize", 0.0),
      ("rtable_brand", 0.0),
      ("rtable_brand/rtable_psize", 0.0),
      ("rtable_brand/rtable_ptype", 0.0),
      ("rtable_brand/rtable_ptype/rtable_psize", 0.5),
      ("rtable_name", 0.0),
      ("rtable_name/rtable_brand", 0.0),
      ("rtable_name/rtable_brand/rtable_psize", 0.5),
      ("rtable_name/rtable_brand/rtable_ptype", 0.5),
      ("rtable_name/rtable_psize", 0.0),
      ("rtable_name/rtable_ptype", 0.0),
      ("rtable_name/rtable_ptype/rtable_psize", 0.5),
      ("rtable_psize", 0.0),
      ("rtable_ptype", 0.0),
      ("rtable_ptype/rtable_psize", 0.0)),
    triangles = Seq(
      ("0@0", "1@0", "0@1003"),
      ("0@0", "1@0", "0@1159"),
      ("0@0", "1@0", "0@1280"),
      ("0@0", "1@0", "0@1976"),
      ("0@0", "1@0", "0@952"),
      ("1@0", "0@0", "1@1192"),
      ("1@0", "0@0", "1@140"),
      ("1@0", "0@0", "1@1415"),
      ("1@0", "0@0", "1@1932"),
      ("1@0", "0@0", "1@980")),
    baselines = Seq(
      ("landmark", "ltable_brand", 0.2648293699780023),
      ("landmark", "ltable_name", 0.2754368930248056),
      ("landmark", "ltable_psize", 0.1397795058211491),
      ("landmark", "ltable_ptype", 0.14041828348369945),
      ("mojito", "ltable_brand", 0.25304879000995356),
      ("mojito", "ltable_name", 0.13939752283491402),
      ("mojito", "ltable_psize", 0.10710314594890791),
      ("mojito", "ltable_ptype", 0.16689398759522517),
      ("shap", "ltable_brand", 0.31417491380706064),
      ("shap", "ltable_name", 0.31417491380706064),
      ("shap", "ltable_psize", 0.18582508619293944),
      ("shap", "ltable_ptype", 0.18582508619293944))),
  // --- sf0.1 ---
  "sf0.1" -> LiveGolden(
    saliency = Seq(
      ("ltable_brand", 0.5),
      ("ltable_name", 0.5),
      ("ltable_psize", 0.5),
      ("ltable_ptype", 0.5),
      ("rtable_brand", 0.5),
      ("rtable_name", 0.5),
      ("rtable_psize", 0.5),
      ("rtable_ptype", 0.5)),
    pss = Seq(
      ("ltable_brand", 0.0),
      ("ltable_brand/ltable_psize", 0.0),
      ("ltable_brand/ltable_ptype", 0.0),
      ("ltable_brand/ltable_ptype/ltable_psize", 0.5),
      ("ltable_name", 0.0),
      ("ltable_name/ltable_brand", 0.0),
      ("ltable_name/ltable_brand/ltable_psize", 0.5),
      ("ltable_name/ltable_brand/ltable_ptype", 0.5),
      ("ltable_name/ltable_psize", 0.0),
      ("ltable_name/ltable_ptype", 0.0),
      ("ltable_name/ltable_ptype/ltable_psize", 0.5),
      ("ltable_psize", 0.0),
      ("ltable_ptype", 0.0),
      ("ltable_ptype/ltable_psize", 0.0),
      ("rtable_brand", 0.0),
      ("rtable_brand/rtable_psize", 0.0),
      ("rtable_brand/rtable_ptype", 0.0),
      ("rtable_brand/rtable_ptype/rtable_psize", 0.5),
      ("rtable_name", 0.0),
      ("rtable_name/rtable_brand", 0.0),
      ("rtable_name/rtable_brand/rtable_psize", 0.5),
      ("rtable_name/rtable_brand/rtable_ptype", 0.5),
      ("rtable_name/rtable_psize", 0.0),
      ("rtable_name/rtable_ptype", 0.0),
      ("rtable_name/rtable_ptype/rtable_psize", 0.5),
      ("rtable_psize", 0.0),
      ("rtable_ptype", 0.0),
      ("rtable_ptype/rtable_psize", 0.0)),
    triangles = Seq(
      ("0@0", "1@0", "0@10081"),
      ("0@0", "1@0", "0@10343"),
      ("0@0", "1@0", "0@10407"),
      ("0@0", "1@0", "0@10696"),
      ("0@0", "1@0", "0@10886"),
      ("1@0", "0@0", "1@10118"),
      ("1@0", "0@0", "1@10528"),
      ("1@0", "0@0", "1@10702"),
      ("1@0", "0@0", "1@1092"),
      ("1@0", "0@0", "1@11000")),
    baselines = Seq(
      ("landmark", "ltable_brand", 0.2648293699780023),
      ("landmark", "ltable_name", 0.2754368930248056),
      ("landmark", "ltable_psize", 0.1397795058211491),
      ("landmark", "ltable_ptype", 0.14041828348369945),
      ("mojito", "ltable_brand", 0.25304879000995356),
      ("mojito", "ltable_name", 0.13939752283491402),
      ("mojito", "ltable_psize", 0.10710314594890791),
      ("mojito", "ltable_ptype", 0.16689398759522517),
      ("shap", "ltable_brand", 0.31417491380706064),
      ("shap", "ltable_name", 0.31417491380706064),
      ("shap", "ltable_psize", 0.18582508619293944),
      ("shap", "ltable_ptype", 0.18582508619293944))),
  )

  /** The scale factor the driver's correctness gate runs at. */
  val verifySf = "sf0.01"

  // string-literal cast: DuckDB parses a bare numeric literal through
  // DECIMAL, which can land one ULP off the Scala double; a quoted
  // string goes through strtod and round-trips exactly
  private def d(v: Double): String = s"CAST('$v' AS DOUBLE)"
  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  def saliencySql(sf: String): String =
    bySf(sf).saliency.map { case (a, v) => s"(${q(a)}, ${d(v)})" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(attribute, saliency) ORDER BY attribute")

  def pssSql(sf: String): String =
    bySf(sf).pss.map { case (a, v) => s"(${q(a)}, ${d(v)})" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(attrSet, pos) ORDER BY attrSet")

  def trianglesSql(sf: String): String =
    bySf(sf).triangles.map { case (u, v, w) => s"(${q(u)}, ${q(v)}, ${q(w)})" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(u, v, w) ORDER BY u, v, w")

  def baselinesSql(sf: String): String =
    bySf(sf).baselines.map { case (m, a, v) => s"(${q(m)}, ${q(a)}, ${d(v)})" }
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") t(method, attribute, weight) ORDER BY method, attribute")
}
