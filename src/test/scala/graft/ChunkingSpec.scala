package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.Chunking

/** Sliding-window chunking specs: hand-computed windows, coverage and
  * overlap invariants, the partition case (stride == size), and edges.
  */
class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  private def doc(n: Int): DataFrame =
    Seq((1L, (1 to n).map(i => s"t$i").mkString(" "))).toDF("id", "text")

  private def rows(df: DataFrame, size: Int, stride: Int): Seq[(Long, Long, Long, String)] =
    Chunking.chunk(df, "text", "id", size, stride)
      .select("chunk_idx", "chunk_start", "chunk_end", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq

  test("short doc yields exactly one whole-doc chunk") {
    val r = rows(doc(5), size = 32, stride = 24)
    assert(r === Seq((0L, 1L, 5L, "t1 t2 t3 t4 t5")))
    // exactly size tokens is still one chunk
    assert(rows(doc(32), 32, 24).map(x => (x._1, x._2, x._3)) === Seq((0L, 1L, 32L)))
  }

  test("overlapping windows advance by stride and cap at the doc end") {
    val r = rows(doc(50), size = 32, stride = 24)
    assert(r.map(x => (x._1, x._2, x._3)) === Seq((0L, 1L, 32L), (1L, 25L, 50L)))
    assert(r(1)._4 === (25 to 50).map(i => s"t$i").mkString(" "))
    // exact-division tail: last window ends exactly at n
    assert(rows(doc(80), 32, 24).map(x => (x._2, x._3)) ===
      Seq((1L, 32L), (25L, 56L), (49L, 80L)))
  }

  test("every token is covered; stride == size partitions the doc") {
    for (n <- Seq(1, 31, 32, 33, 57, 100); stride <- Seq(16, 24, 32)) {
      val r = rows(doc(n), size = 32, stride = stride)
      val covered = r.flatMap(x => x._2 to x._3).toSet
      assert(covered === (1L to n).toSet, s"n=$n stride=$stride")
    }
    val part = rows(doc(100), size = 32, stride = 32)
    assert(part.map(x => (x._2, x._3)) ===
      Seq((1L, 32L), (33L, 64L), (65L, 96L), (97L, 100L)))
    // non-last chunks of a partition reassemble the doc exactly
    assert(part.map(_._4).mkString(" ") === (1 to 100).map(i => s"t$i").mkString(" "))
  }

  test("null texts drop; invalid stride rejected") {
    val d = Seq((1L, "a b c"), (2L, null)).toDF("id", "text")
    assert(Chunking.chunk(d, "text", "id", 2, 2).select("id")
      .distinct().collect().map(_.getLong(0)).toSeq === Seq(1L))
    intercept[IllegalArgumentException] {
      Chunking.chunk(d, "text", "id", 2, 3)
    }
  }
}
