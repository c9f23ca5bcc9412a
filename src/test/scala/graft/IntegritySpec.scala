package graft

import graft.operators.Integrity._

/** The q129 fixture passes clean, so this spec feeds DIRTY data and
  * pins that each check actually counts its violations.
  */
class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("uniqueKey counts every row of a duplicated key") {
    val df = Seq(1L, 2L, 2L, 2L, 3L).toDF("k")
    val r = uniqueKey(df, "pk", Seq("k")).collect()(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2)) === (("pk", 3L, 5L)))
  }

  test("foreignKey counts orphans, notNull counts nulls, accepted counts domain breaks") {
    val dim = Seq(1L, 2L).toDF("id")
    val fact = Seq(1L, 2L, 7L, 9L).toDF("fk")
    val fkRow = foreignKey(fact, "fk", "fk", dim, "id").collect()(0)
    assert((fkRow.getLong(1), fkRow.getLong(2)) === ((2L, 4L)))

    val nn = Seq(Some("a"), None, Some("b"), None).toDF("v")
    val nnRow = notNull(nn, "nn", "v").collect()(0)
    assert((nnRow.getLong(1), nnRow.getLong(2)) === ((2L, 4L)))

    val dom = Seq(Some("x"), Some("y"), Some("z"), None).toDF("v")
    val dRow = accepted(dom, "dom", "v", Seq("x", "y")).collect()(0)
    assert((dRow.getLong(1), dRow.getLong(2)) === ((1L, 4L)))
  }

  test("every check reports n_bad = 0 (not NULL) on an empty table") {
    // sum(when(...)) over zero rows is null — a gate evaluating
    // n_bad == 0 would misbehave unless every check coalesces
    val emptyS = Seq.empty[String].toDF("v")
    val emptyL = Seq.empty[Long].toDF("k")
    for (r <- Seq(
        uniqueKey(emptyL, "pk", Seq("k")).collect()(0),
        notNull(emptyS, "nn", "v").collect()(0),
        accepted(emptyS, "dom", "v", Seq("x")).collect()(0),
        foreignKey(emptyL, "fk", "k", Seq(1L).toDF("id"), "id")
          .collect()(0))) {
      assert(!r.isNullAt(1) && r.getLong(1) === 0L && r.getLong(2) === 0L)
    }
  }

  test("suite unions one row per check, ordered by name") {
    val df = Seq(1L, 1L).toDF("k")
    val out = suite(Seq(
      uniqueKey(df, "b_check", Seq("k")),
      notNull(df, "a_check", "k"))).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a_check", "b_check"))
  }
}
