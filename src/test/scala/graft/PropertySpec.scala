package graft

import org.scalacheck.{Gen, Prop}
import graft.functions.{HashSketches, TextSim}
import graft.perturb.Perturb

/** ScalaCheck properties for the algebraic invariants SURVEY.md §5
  * names: powerset cardinality, cosine bounds/symmetry, sketch
  * stability.
  */
class PropertySpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  private def binom(n: Int, k: Int): Long =
    if (k < 0 || k > n) 0L
    else (1 to k).foldLeft(1L)((acc, i) => acc * (n - i + 1) / i)

  private val word: Gen[String] = Gen.choose(1, 6)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val text: Gen[String] = Gen.choose(0, 12)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  /** Driver-side twin of Dedup.simhashPortable (same md5/vote formula)
    * for cross-checking the Catalyst expression.
    */
  private def portableSimhash60Jvm(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = text.split(" ").map { t =>
      md.reset()
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    (0 until 60).foldLeft(0L) { (sig, b) =>
      val vote = hashes.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
      if (vote > 0) sig | (1L << b) else sig
    }
  }

  test("portable simhash: matches JVM twin, permutation-invariant, 60-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Gen.listOfN(40, text).sample.get.filter(_.nonEmpty).distinct
    val shuffled = texts.map(t => scala.util.Random.shuffle(t.split(" ").toList)
      .mkString(" "))
    val got = texts.zip(shuffled).toDF("t", "ts")
      .select(col("t"),
        graft.dedup.Dedup.simhashPortable(col("t")).as("sig"),
        graft.dedup.Dedup.simhashPortable(col("ts")).as("sigShuffled"))
      .collect()
    got.foreach { r =>
      val expect = portableSimhash60Jvm(r.getString(0))
      assert(r.getLong(1) === expect, s"text='${r.getString(0)}'")
      assert(r.getLong(1) >= 0L && r.getLong(1) < (1L << 60))
      // bit votes are order-insensitive sums → permutation-invariant
      assert(r.getLong(2) === r.getLong(1))
    }
  }

  test("powerset: |subsets(attrs, k)| = C(n, k), all size k, all distinct") {
    check(Prop.forAll(Gen.choose(0, 8), Gen.choose(0, 8)) { (n, k) =>
      val attrs = (1 to n).map("a" + _)
      val ss = Perturb.subsets(attrs, k)
      ss.length == binom(n, k) &&
        ss.forall(_.size == k) &&
        ss.distinct.length == ss.length
    })
  }

  test("cosine: symmetric, bounded, 1 on self, 0 on disjoint") {
    check(Prop.forAll(text, text) { (a, b) =>
      val ab = TextSim.cosineBags(a, b)
      val ba = TextSim.cosineBags(b, a)
      math.abs(ab - ba) < 1e-12 && ab >= 0.0 && ab <= 1.0 + 1e-12
    })
    check(Prop.forAll(text.suchThat(_.trim.nonEmpty)) { a =>
      math.abs(TextSim.cosineBags(a, a) - 1.0) < 1e-9
    })
  }

  test("minhash: signature stable under self, length = numHashes") {
    check(Prop.forAll(text, Gen.choose(1, 6)) { (t, n) =>
      val s1 = HashSketches.minhashSignature(t, n, 3)
      val s2 = HashSketches.minhashSignature(t, n, 3)
      s1.length == n && s1.sameElements(s2)
    })
  }

  test("winnowing: detection guarantee, sampling bound, determinism") {
    val k = 3; val w = 4
    // any shared token run of length ≥ w+k-1 must yield a common
    // fingerprint — the winnowing paper's detection guarantee
    val run = Gen.choose(w + k - 1, w + k + 3)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    check(Prop.forAll(run, text, text) { (shared, pre, post) =>
      val a = (pre + " " + shared).trim
      val b = (shared + " " + post).trim
      val fa = HashSketches.winnowFingerprints(a, k, w).toSet
      val fb = HashSketches.winnowFingerprints(b, k, w).toSet
      fa.intersect(fb).nonEmpty
    })
    // sketch ≤ #windows, sorted distinct, deterministic
    check(Prop.forAll(text) { t =>
      val f1 = HashSketches.winnowFingerprints(t, k, w)
      val f2 = HashSketches.winnowFingerprints(t, k, w)
      val nGrams = math.max(1, t.split(" ", -1).length - k + 1)
      f1.sameElements(f2) &&
        f1.length <= math.max(1, nGrams - w + 1) &&
        f1.sameElements(f1.distinct.sorted)
    })
  }

  test("minhash: containment — a superset document keeps shingle minima") {
    // appending text can only add shingles → each min can only decrease
    check(Prop.forAll(text.suchThat(_.split(" ").length >= 3), word) { (t, w) =>
      val base = HashSketches.minhashSignature(t, 4, 3)
      val ext = HashSketches.minhashSignature(t + " " + w, 4, 3)
      base.zip(ext).forall { case (b, e) => e <= b }
    })
  }

  test("simhash: deterministic; hamming to self is 0") {
    check(Prop.forAll(text) { t =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      HashSketches.simhash64(u) == HashSketches.simhash64(u)
    })
  }

  test("TopKAgg: any partitioning/merge tree ≡ global sort-take") {
    import graft.operators.{Scored, TopKAgg}
    val rows: Gen[List[(Int, Long)]] = Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 9), Gen.choose(0L, 30L))))
    val kGen = Gen.choose(1, 6)
    check(Prop.forAll(rows, kGen, Gen.choose(1, 5)) { (xs, k, parts) =>
      val agg = new TopKAgg(k)
      // partition arbitrarily, reduce each slice, merge left-to-right —
      // the partial/final aggregation path Spark will drive
      val slices = xs.zipWithIndex.groupBy(_._2 % parts).values
        .map(_.map { case ((s, i), _) => Scored(s.toDouble, i) })
      val merged = slices.foldLeft(agg.zero) { (acc, slice) =>
        agg.merge(acc, slice.foldLeft(agg.zero)(agg.reduce))
      }
      val got = agg.finish(merged)
      val want = xs.map { case (s, i) => Scored(s.toDouble, i) }
        .sortBy(s => (-s.score, s.id)).take(k)
      got == want
    })
  }

  test("fuzzy join: deletion-neighborhood blocking ≡ brute force (complete, exact)") {
    // FastSS completeness: lev(a,b) ≤ d ⇒ the ≤d-deletion
    // neighborhoods intersect, so the blocked candidate join + exact
    // verify must return EXACTLY the brute-force pair set. Alphabet
    // {a,b} + short strings maximize dense neighborhoods (the hardest
    // case for completeness). Driver-side Levenshtein as the oracle.
    def lev(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    import spark.implicits._
    val short: Gen[String] = Gen.choose(0, 5)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
    val pool: Gen[List[String]] = Gen.choose(1, 8).flatMap(Gen.listOfN(_, short))
    val p = Prop.forAll(pool, Gen.oneOf(1, 2)) { (xs, d) =>
      val names = xs.distinct
      val got = graft.text.Fuzzy
        .fuzzyPairs(names.toDF("name"), "name", maxDist = d)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      val want = (for {
        a <- names; b <- names if a < b
        dist = lev(a, b) if dist <= d
      } yield (a, b, dist)).toSet
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  test("scd2: random batch sequence ≡ driver-side interval fold") {
    // independent model: per key, fold the batch sequence into a
    // version list with the close/reopen/insert/no-op rules; the
    // engine's exploded-join implementation must produce the exact
    // same (key, attr, from, to, current) set after ANY sequence —
    // including repeated no-ops and re-inserts of changed keys.
    import spark.implicits._
    val batchGen: Gen[Map[Long, Int]] = Gen.choose(0, 5).flatMap(n =>
      Gen.mapOfN(n, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0, 2))))
    val seqGen: Gen[List[Map[Long, Int]]] =
      Gen.choose(1, 4).flatMap(Gen.listOfN(_, batchGen))
    val p = Prop.forAll(seqGen) { batches =>
      val initKeys = Seq(1L, 2L, 3L)
      var table = graft.operators.Scd2.initial(
        initKeys.map(k => (k, 0)).toDF("k", "a"), 0L)
      // driver model: key -> list of (attr, from, to(-1=open))
      var model = initKeys.map(k =>
        k -> List((0, 0L, -1L))).toMap
      batches.zipWithIndex.foreach { case (b, i) =>
        val asOf = (i + 1) * 100L
        if (b.nonEmpty) {
          table = graft.operators.Scd2.apply(table,
            b.toSeq.map { case (k, a) => (k, a) }.toDF("k", "a"),
            Seq("k"), Seq("a"), asOf)
          model = b.foldLeft(model) { case (m, (k, a)) =>
            m.get(k) match {
              case None => m + (k -> List((a, asOf, -1L)))
              case Some(vs) =>
                val (open, closed) = vs.partition(_._3 == -1L)
                val cur = open.head
                if (cur._1 == a) m
                else m + (k -> (closed ++ List(
                  (cur._1, cur._2, asOf), (a, asOf, -1L))))
            }
          }
        }
      }
      val got = table.collect().map(r => (r.getLong(0), r.getInt(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      val want = model.toSeq.flatMap { case (k, vs) =>
        vs.map(v => (k, v._1, v._2, v._3))
      }.toSet
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  test("setsim join: prefix filtering ≡ brute force at several thresholds") {
    // AllPairs completeness: J(a,b) ≥ t ⇒ the (L − ⌈tL⌉ + 1)-prefixes
    // under the (df, token) order intersect. Small vocab + short docs
    // maximize collisions; driver-side Jaccard is the oracle.
    import spark.implicits._
    val word: Gen[String] = Gen.oneOf("w0", "w1", "w2", "w3", "w4", "w5")
    val doc: Gen[String] = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val docs: Gen[List[String]] = Gen.choose(1, 8).flatMap(Gen.listOfN(_, doc))
    val p = Prop.forAll(docs, Gen.oneOf(40, 60, 80, 100)) { (xs, t100) =>
      val df = xs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      val got = graft.dedup.SetSimJoin
        .similarPairs(df, "text", "doc_id", t100)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = xs.zipWithIndex
        .map { case (s, i) => i.toLong -> s.split(" ").filter(_.nonEmpty).toSet }
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        ni = (sa & sb).size; nu = (sa | sb).size
        if nu > 0 && ni * 100 >= nu * t100
      } yield (ia, ib)).toSet
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  test("bpe merge (a≠b): greedy left-to-right fold ≡ order-free parallel rebuild") {
    // The q115 oracle's per-stage rewrite: fuse every (a,b) adjacency,
    // drop every b whose left neighbor is a. For a≠b this is exactly
    // the greedy left-to-right semantics of Bpe.mergeSyms (a fused
    // symbol can never re-match, and no position is both a fuse start
    // and a consumed right piece). The equivalence is what licenses
    // DuckDB's CASE/list_transform replay of the Spark aggregate fold.
    def greedy(s: List[String], a: String, b: String): List[String] =
      s.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b)
          acc.init :+ (a + b)
        else acc :+ x
      }
    def parallel(s: Vector[String], a: String, b: String): List[String] =
      s.indices.flatMap { i =>
        if (s(i) == a && i + 1 < s.length && s(i + 1) == b) Some(a + b)
        else if (s(i) == b && i > 0 && s(i - 1) == a) None
        else Some(s(i))
      }.toList
    val sym: Gen[String] = Gen.oneOf("a", "b", "c", "ab", "bc")
    val seqGen: Gen[List[String]] = Gen.choose(0, 12).flatMap(Gen.listOfN(_, sym))
    val pair: Gen[(String, String)] =
      Gen.zip(sym, sym).suchThat { case (a, b) => a != b }
    check(Prop.forAll(seqGen, pair) { case (xs, (a, b)) =>
      greedy(xs, a, b) == parallel(xs.toVector, a, b)
    })
    // and the Spark-side expression agrees with the driver-side greedy
    // fold on the q115 merge table, chained through all 8 stages
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.text.Bpe
    val merges = graft.queries.PipelineQueries.encodeMerges
    val words = List("the", "andthen", "errer", "nonsense", "thethe",
      "anand", "rere", "x", "")
    val got = words.toDF("w")
      .select(Bpe.applyMerges(Bpe.charSyms(col("w")), merges).as("s"))
      .collect().map(_.getSeq[String](0).toList).toList
    val want = words.map { w =>
      merges.sortBy(_.rank).foldLeft(w.split("").filter(_.nonEmpty).toList) {
        (s, m) => greedy(s, m.left, m.right)
      }
    }
    assert(got === want)
    assert(got.zip(words).forall { case (s, w) => s.mkString == w })
  }

  test("incremental near-dup == full replay, over random corpora with planted dups") {
    // THE q197 contract, property-checked: for corpora with random
    // near-dup structure crossing the history/batch split, the
    // incremental path equals the full replay restricted to the batch.
    // Few samples, small corpora — each sample runs three full dedups
    // (history, incremental, replay) through the component closure.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.dedup.Dedup
    val base = ("the quick brown fox jumps over the lazy dog near the " +
      "river bank every single morning before work starts").split(" ")
    def variant(rnd: scala.util.Random): String = {
      val drop = rnd.nextInt(base.length)
      base.zipWithIndex.filter(_._2 != drop).map(_._1).mkString(" ")
    }
    def fresh(rnd: scala.util.Random, i: Long): String =
      s"unique document number $i " + Seq.fill(10)(
        ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(5)))
        .mkString(" ")
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // ids 0..19 history, 100..119 batch; ~half of each side is a
      // near-dup variant of the shared base text (cross-split dup
      // structure guaranteed), the rest unique
      def mk(idBase: Long): Seq[(Long, String)] =
        (0 until 20).map(i => (idBase + i,
          if (rnd.nextBoolean()) variant(rnd) else fresh(rnd, idBase + i)))
      val history = mk(0L).toDF("doc_id", "text")
      val batch = mk(100L).toDF("doc_id", "text")
      val histR = Dedup.dropNearDuplicates(history, "text", "doc_id", 0.6)
      val histSurv = histR.survivors.cache()
      val inc = Dedup.incrementalNearDuplicates(histSurv, batch,
        "text", "doc_id", 0.6)
      val got = inc.survivors.select("doc_id").collect()
        .map(_.getLong(0)).toSet
      val full = Dedup.dropNearDuplicates(histSurv.unionByName(batch),
        "text", "doc_id", 0.6)
      val want = full.survivors.filter(col("doc_id") >= 100L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === want, s"seed=$seed")
      full.close(); inc.close(); histSurv.unpersist(); histR.close()
    }
  }
}
