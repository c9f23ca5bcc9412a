package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** As-of join specs: hand-computed latest-prior resolution, tie and
  * boundary semantics, horizon nulling, brute-force equivalence on a
  * randomized fixture, and the zero-join plan pin.
  */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  // timestamps as epoch micros for exact arithmetic
  private def lefts(rows: (Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("purchase_id", "user_id", "us")
      .select(col("purchase_id"), col("user_id"),
        timestamp_micros(col("us")).as("p_ts"))

  private def rights(rows: (Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("click_id", "user_id", "us")
      .select(col("click_id"), col("user_id"),
        timestamp_micros(col("us")).as("c_ts"))

  private def run(l: DataFrame, r: DataFrame): Map[Long, Option[Long]] =
    AsOf.joinAsOf(l, r, Seq("user_id"), "p_ts", "c_ts",
        tieCol = "click_id", payload = Seq("click_id"))
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(3)) None else Some(row.getLong(3)))).toMap

  test("latest prior right row wins; no prior → null; other keys ignored") {
    val l = lefts((100L, 1L, 1000L), (101L, 1L, 50L), (102L, 2L, 1000L))
    val r = rights((7L, 1L, 10L), (8L, 1L, 900L), (9L, 3L, 999L))
    assert(run(l, r) === Map(
      100L -> Some(8L),  // click 8 at 900 beats click 7 at 10
      101L -> Some(7L),  // only click 7 is at-or-before 50
      102L -> None))     // user 2 has no clicks (user 3's don't leak)
  }

  test("exactly-simultaneous right row is visible; ties pick max tieCol") {
    val l = lefts((100L, 1L, 500L))
    val r = rights((3L, 1L, 500L), (9L, 1L, 500L), (5L, 1L, 400L))
    assert(run(l, r) === Map(100L -> Some(9L)))
  }

  test("left columns and multi-payload survive the round trip") {
    val l = lefts((100L, 1L, 1000L)).withColumn("note", lit("keep"))
    val r = rights((7L, 1L, 800L))
    val out = AsOf.joinAsOf(l, r, Seq("user_id"), "p_ts", "c_ts",
      "click_id", Seq("click_id", "c_ts"))
    assert(out.columns.toSeq ===
      Seq("purchase_id", "user_id", "p_ts", "note", "click_id", "c_ts"))
    val row = out.head()
    assert(row.getAs[String]("note") === "keep")
    assert(row.getAs[Long]("click_id") === 7L)
    assert(row.getAs[java.sql.Timestamp]("c_ts").getTime === 0L) // 800 us
  }

  test("joinAsOfWithin nulls matches older than the horizon") {
    val l = lefts((100L, 1L, 1000L), (101L, 2L, 1000L))
    val r = rights((7L, 1L, 100L), (8L, 2L, 950L))
    val out = AsOf.joinAsOfWithin(l, r, Seq("user_id"), "p_ts", "c_ts",
        "click_id", Seq("click_id"), horizonMicros = 500L)
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(3)) None else Some(row.getLong(3)))).toMap
    assert(out === Map(
      100L -> None,      // lag 900 us > 500 us horizon
      101L -> Some(8L))) // lag 50 us within horizon
  }

  test("matches brute-force resolution on a randomized fixture") {
    val rnd = new scala.util.Random(11)
    val ls = Seq.tabulate(60)(i =>
      (100L + i, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    val rs = Seq.tabulate(80)(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    val brute = ls.map { case (pid, u, ts) =>
      val cands = rs.filter(c => c._2 == u && c._3 <= ts)
      pid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(c => (c._3, c._1))._1))
    }.toMap
    assert(run(lefts(ls: _*), rights(rs: _*)) === brute)
  }

  test("plan pin: as-of resolves with ZERO join operators") {
    val out = AsOf.joinAsOf(lefts((100L, 1L, 1000L)), rights((7L, 1L, 10L)),
      Seq("user_id"), "p_ts", "c_ts", "click_id", Seq("click_id"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }
}
