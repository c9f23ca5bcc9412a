package graft

import graft.baselines.{Landmark, Mojito}
import graft.matcher.TokenCosineModel

/** The LIME-style baseline must attribute the match to the column that
  * actually carries the shared tokens.
  */
class MojitoSpec extends SparkSpec {

  import spark.implicits._

  test("mojito weights the match-carrying attribute highest") {
    val l = Seq((0L, "alpha beta gamma delta", "xx yy")).toDF("id", "name", "city")
    val r = Seq((0L, "alpha beta gamma delta", "zz ww")).toDF("id", "name", "city")
    val weights = Mojito.explain(l, r, TokenCosineModel(), side = "l",
      numSamples = 64)
      .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    // dropping name tokens lowers cosine; city tokens never match
    assert(weights("ltable_name") > weights("ltable_city"))
    assert(weights("ltable_name") > 0.0)
  }

  test("landmark rollup still ranks the shared-token attribute first") {
    val l = Seq((0L, "alpha beta gamma delta", "xx yy")).toDF("id", "name", "city")
    val r = Seq((0L, "alpha beta gamma delta", "zz ww")).toDF("id", "name", "city")
    val weights = Landmark.explain(l, r, TokenCosineModel(), side = "l",
      numSamples = 64)
      .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(weights("ltable_name") > weights("ltable_city"))
  }

  test("landmark per-token table: shape, positions, injection extends positions") {
    val l = Seq((0L, "alpha beta gamma", "xx yy")).toDF("id", "name", "city")
    val r = Seq((1L, "alpha beta omega", "zz ww")).toDF("id", "name", "city")

    val single = Landmark.explainInstance(l, r, TokenCosineModel(),
      variableSide = "l", inject = false, numSamples = 64)
    assert(single.columns.toSeq ===
      Seq("id", "column", "position", "word", "word_prefix", "impact", "conf"))
    val rows = single.collect()
    // 3 name tokens + 2 city tokens of the left record
    assert(rows.length === 5)
    assert(rows.forall(_.getString(6) === "right_landmark"))
    val namePos = rows.filter(_.getString(1) == "ltable_name").map(_.getInt(2)).sorted
    assert(namePos.toSeq === Seq(0, 1, 2))
    // word_prefix encodes <letter><pos>_<word> (Mapper convention)
    assert(rows.exists(_.getString(4) == "A00_alpha"))

    // 'double' conf: the landmark's non-overlapping tokens (omega, zz,
    // ww) inject into the variable side at positions past the originals
    val double = Landmark.explainInstance(l, r, TokenCosineModel(),
      variableSide = "l", inject = true, numSamples = 64).collect()
    assert(double.length === 5 + 3)
    assert(double.forall(_.getString(6) === "right_landmark_injection"))
    val injected = double.filter(r0 => r0.getString(1) == "ltable_name" &&
      r0.getInt(2) >= 3)
    assert(injected.map(_.getString(3)).toSet === Set("omega"))

    // 'LIME' conf: both sides perturbed together, no landmark
    val lime = Landmark.explainInstance(l, r, TokenCosineModel(),
      variableSide = "all", numSamples = 64).collect()
    assert(lime.forall(_.getString(6) === "LIME"))
    assert(lime.map(_.getString(1)).toSet ===
      Set("ltable_name", "ltable_city", "rtable_name", "rtable_city"))
    assert(lime.length === 10) // 5 left tokens + 5 right tokens

    // auto on a match: both orientations, no injection
    val auto = Landmark.explainAuto(l, r, TokenCosineModel(), label = 1,
      numSamples = 64)
    assert(auto.select("conf").distinct().collect().map(_.getString(0)).toSet ===
      Set("right_landmark", "left_landmark"))
    // rollup yields one weight per attribute of both sides
    val rolled = Landmark.attributeImpacts(auto).collect()
      .map(r0 => r0.getString(0) -> r0.getDouble(1)).toMap
    assert(rolled.keySet === Set("ltable_name", "ltable_city",
      "rtable_name", "rtable_city"))
    assert(rolled("ltable_name") > rolled("ltable_city"))
  }
}
