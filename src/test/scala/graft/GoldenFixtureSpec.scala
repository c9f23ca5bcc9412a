package graft

import graft.queries.GoldenFixture

/** Round-start guard: the frozen goldens (q25-q28, q60-q63, q96,
  * q170-q171) bind to fixture CONTENT, and the driver regenerates
  * /root/testdata between rounds. This spec fails `sbt test` loudly —
  * with the regeneration instruction — the moment the dependency
  * columns' content hash moves, instead of letting the golden queries
  * go hash-red one by one.
  */
class GoldenFixtureSpec extends SparkSpec {

  for ((sfTag, expected) <- GoldenFixture.frozen.toSeq.sortBy(_._1)) {
    val dir = s"/root/testdata/$sfTag"
    test(s"golden fixture content unchanged at $sfTag") {
      assume(new java.io.File(dir).isDirectory)
      val stale = GoldenFixture.staleness(spark, dir)
      assert(stale.isEmpty,
        s"\n${stale.mkString("\n")}\nFixtures regenerated — run " +
          "`sbt \"runMain graft.tools.GoldenGen\"` and paste the new " +
          "constants before trusting golden queries.")
    }
  }

  test("frozen hash map covers every SF dir the goldens are checked at") {
    assert(GoldenFixture.frozen.keySet ===
      Set("sf0.001", "sf0.01", "sf0.1"))
  }
}
