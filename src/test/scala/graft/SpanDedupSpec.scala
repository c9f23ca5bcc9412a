package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.SpanDedup

/** Duplicated-span dedup specs: hand-computed spans on cross-doc and
  * within-doc duplication, merge semantics (overlap vs gap), removal
  * correctness, and full/empty coverage edges.
  */
class SpanDedupSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("id", "text")

  private def spans(df: DataFrame, n: Int, minCount: Int = 2): Map[Long, Seq[(Long, Long)]] =
    SpanDedup.duplicatedSpans(df, "text", "id", n = n, minCount = minCount)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sortBy(_._1).toSeq }

  private def clean(df: DataFrame, n: Int, minCount: Int = 2): Map[Long, String] = {
    val sp = SpanDedup.duplicatedSpans(df, "text", "id", n = n, minCount = minCount)
    SpanDedup.removeSpans(df, sp, "text", "id")
      .select(col("id"), col("clean_text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("cross-doc shared run marks the covered window in both docs") {
    // 3-grams of the shared run "a b c d e f" are duplicated; doc 1
    // covers tokens 1..6, doc 2 covers tokens 3..8
    val d = docs(
      1L -> "a b c d e f g h",
      2L -> "x y a b c d e f q")
    assert(spans(d, n = 3) === Map(
      1L -> Seq((1L, 6L)),
      2L -> Seq((3L, 8L))))
  }

  test("within-doc repetition counts toward the occurrence total") {
    // "p q r" occurs twice inside one doc → both windows duplicated,
    // spans [1,3] and [5,7] (gap at token 4 keeps them separate)
    val d = docs(1L -> "p q r z p q r")
    assert(spans(d, n = 3) === Map(1L -> Seq((1L, 3L), (5L, 7L))))
  }

  test("adjacent windows merge; a gap wider than the window does not") {
    // doc 1 and 2 share "a b c" (tokens 1-3) and "d e f" (tokens 4-6 in
    // doc 1: adjacent → one span [1,6]; tokens 6-8 in doc 2 with a gap
    // at 4-5 → two spans)
    val d = docs(
      1L -> "a b c d e f",
      2L -> "a b c x y d e f")
    assert(spans(d, n = 3) === Map(
      1L -> Seq((1L, 6L)),
      2L -> Seq((1L, 3L), (6L, 8L))))
  }

  test("removal keeps order and drops exactly the covered tokens") {
    val d = docs(
      1L -> "a b c d e f g h",
      2L -> "x y a b c d e f q")
    assert(clean(d, n = 3) === Map(
      1L -> "g h",
      2L -> "x y q"))
  }

  test("no duplicates → zero spans and unchanged text; full coverage → empty") {
    val d = docs(
      1L -> "u v w q1 q2",          // unique tokens, no duplicated grams
      2L -> "m n o",                 // fully duplicated with doc 3
      3L -> "m n o")
    assert(spans(d, n = 3).get(1L).isEmpty)
    val c = clean(d, n = 3)
    assert(c(1L) === "u v w q1 q2")
    assert(c(2L) === "")
    assert(c(3L) === "")
  }

  test("minCount above the occurrence total suppresses the span") {
    val d = docs(1L -> "m n o", 2L -> "m n o")
    assert(spans(d, n = 3, minCount = 3) === Map.empty)
    assert(spans(d, n = 3, minCount = 2) === Map(
      1L -> Seq((1L, 3L)), 2L -> Seq((1L, 3L))))
  }

  test("docs shorter than the window emit no windows and survive removal") {
    val d = docs(1L -> "a b", 2L -> "a b")
    assert(spans(d, n = 3) === Map.empty)
    assert(clean(d, n = 3) === Map(1L -> "a b", 2L -> "a b"))
  }

  test("census totals agree with spans and removal on the fixture") {
    val d = docs(
      1L -> "a b c d e f g h",
      2L -> "x y a b c d e f q",
      3L -> "solo tokens only here")
    val census = SpanDedup.spanCensus(d, "text", "id", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(census(1L) === ((8L, 1L, 6L, m("g h"))))
    assert(census(2L) === ((9L, 1L, 6L, m("x y q"))))
    assert(census(3L) === ((4L, 0L, 0L, m("solo tokens only here"))))
  }

  test("loss mask zeroes exactly the covered tokens; removal equals " +
      "keeping the mask's 1-positions") {
    val d = docs(
      1L -> "a b c d e f g h",
      2L -> "x y a b c d e f q",
      3L -> "solo tokens only here")
    val sp = SpanDedup.duplicatedSpans(d, "text", "id", n = 3)
    val masked = SpanDedup.lossMask(d, sp, "text", "id")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("loss_mask"), r.getAs[Long]("n_masked")))).toMap
    // doc 1: span [1,6] → six zeros then "g h" trains
    assert(masked(1L) === (("00000011", 6L)))
    // doc 2: span [3,8] → "x y" and trailing "q" train
    assert(masked(2L) === (("110000001", 6L)))
    // doc 3: nothing duplicated → all ones
    assert(masked(3L) === (("1111", 0L)))
    // invariant vs removal: the tokens at '1' positions ARE clean_text
    val texts = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cl = clean(d, n = 3)
    masked.foreach { case (id, (mask, _)) =>
      val toks = texts(id).split(" ")
      assert(mask.length === toks.length)
      val kept = toks.zip(mask).collect { case (t, '1') => t }.mkString(" ")
      assert(kept === cl(id))
    }
    // full coverage edge: every token masked, none removed from the doc
    val dup = docs(4L -> "p q r", 5L -> "p q r")
    val spd = SpanDedup.duplicatedSpans(dup, "text", "id", n = 3)
    val md = SpanDedup.lossMask(dup, spd, "text", "id")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[String]("loss_mask")).toMap
    assert(md === Map(4L -> "000", 5L -> "000"))
  }
}
