package graft

import graft.operators.Scd2
import org.apache.spark.sql.functions._

/** SCD2 semantics: version emission per case, and the property the
  * whole design exists for — any past snapshot is reconstructible
  * from the version intervals.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def dim0 = Scd2.initial(
    Seq((1L, "A", 10), (2L, "B", 20), (3L, "C", 30))
      .toDF("k", "seg", "nat"), 0L)

  test("apply emits carry / no-op / close+reopen / insert correctly") {
    // k=1 changed, k=2 no-op (identical attrs), k=3 absent, k=9 new
    val batch = Seq((1L, "A2", 10), (2L, "B", 20), (9L, "Z", 90))
      .toDF("k", "seg", "nat")
    val out = Scd2.apply(dim0, batch, Seq("k"), Seq("seg", "nat"), 100L)
      .select("k", "seg", "nat", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5))).toSet
    assert(out === Set(
      (1L, "A", 10, 0L, 100L, false),  // closed
      (1L, "A2", 10, 100L, -1L, true), // reopened
      (2L, "B", 20, 0L, -1L, true),    // no-op keeps the open row
      (3L, "C", 30, 0L, -1L, true),    // carry
      (9L, "Z", 90, 100L, -1L, true))) // insert
  }

  test("asOfView reconstructs every historical snapshot") {
    val b1 = Seq((1L, "A2", 10)).toDF("k", "seg", "nat")
    val b2 = Seq((1L, "A3", 10), (2L, "B2", 20)).toDF("k", "seg", "nat")
    val dim2 = Scd2.apply(
      Scd2.apply(dim0, b1, Seq("k"), Seq("seg", "nat"), 100L),
      b2, Seq("k"), Seq("seg", "nat"), 200L)
    def snap(t: Long) = Scd2.asOfView(dim2, t)
      .select("k", "seg").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(snap(50L) === Map(1L -> "A", 2L -> "B", 3L -> "C"))
    assert(snap(150L) === Map(1L -> "A2", 2L -> "B", 3L -> "C"))
    assert(snap(250L) === Map(1L -> "A3", 2L -> "B2", 3L -> "C"))
    // exactly one valid version per key at any time
    for (t <- Seq(0L, 100L, 200L, 999L))
      assert(Scd2.asOfView(dim2, t).groupBy("k").count()
        .filter(col("count") > 1).count() === 0L)
  }
}
