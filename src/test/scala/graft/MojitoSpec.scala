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

  test("landmark injection still ranks the shared-token attribute first") {
    val l = Seq((0L, "alpha beta gamma delta", "xx yy")).toDF("id", "name", "city")
    val r = Seq((0L, "alpha beta gamma delta", "zz ww")).toDF("id", "name", "city")
    val weights = Landmark.explain(l, r, TokenCosineModel(), side = "l",
      numSamples = 64)
      .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(weights("ltable_name") > weights("ltable_city"))
  }
}
