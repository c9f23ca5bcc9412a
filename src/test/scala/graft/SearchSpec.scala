package graft

import org.apache.spark.sql.DataFrame
import graft.text.Search

/** Keyword-retrieval specs: hand-computed postings, conjunctive
  * semantics (ALL terms required), tf-sum ranking with doc-id
  * tiebreaks, and agreement between the index-free top-k and a brute
  * force over the inverted index.
  */
class SearchSpec extends SparkSpec {

  import spark.implicits._

  private val corpus: DataFrame = Seq(
    (1L, "spark join hash join scan"),
    (2L, "hash scan hash scan join"),
    (3L, "join join join"),
    (4L, "scan hash"),
    (5L, null.asInstanceOf[String])
  ).toDF("id", "text")

  test("inverted index holds exact per-doc term frequencies") {
    val idx = Search.invertedIndex(corpus, "text", "id")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(idx(("join", 1L)) === 2L)
    assert(idx(("hash", 2L)) === 2L)
    assert(idx(("join", 3L)) === 3L)
    assert(idx.get(("spark", 2L)).isEmpty)
    // null doc contributes nothing; postings count = distinct (term, doc)
    assert(!idx.keys.exists(_._2 == 5L))
    assert(idx.size === 4 + 3 + 1 + 2)
  }

  test("conjunctive top-k requires every term and ranks by summed tf") {
    val r = Search.conjunctiveTopK(corpus, "text", "id",
        Seq("hash", "scan"), k = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    // doc 3 lacks both; doc 1 has 1+1, doc 2 has 2+2, doc 4 has 1+1;
    // tie between 1 and 4 breaks on ascending id
    assert(r === Seq((2L, 4L), (1L, 2L), (4L, 2L)))
    // k truncates after the deterministic order
    assert(Search.conjunctiveTopK(corpus, "text", "id", Seq("hash", "scan"), 1)
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("index-free top-k agrees with brute force over the index") {
    val terms = Seq("join", "scan")
    val viaIndex = Search.invertedIndex(corpus, "text", "id")
      .collect().map(r => (r.getLong(1), r.getString(0), r.getLong(2)))
      .groupBy(_._1).toSeq
      .filter { case (_, ps) => terms.forall(t => ps.exists(_._2 == t)) }
      .map { case (id, ps) =>
        (id, ps.filter(p => terms.contains(p._2)).map(_._3).sum) }
      .sortBy { case (id, s) => (-s, id) }
    val direct = Search.conjunctiveTopK(corpus, "text", "id", terms, 10)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(direct === viaIndex)
  }

  test("positional index holds sorted 1-based positions per (term, doc)") {
    val pos = Search.positionalIndex(corpus, "text", "id")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[Long](2))
      .toMap
    assert(pos(("join", 1L)) === Seq(2L, 4L))
    assert(pos(("hash", 2L)) === Seq(1L, 3L))
    assert(pos(("spark", 1L)) === Seq(1L))
    // positions reconstruct tfs exactly
    val tf = Search.invertedIndex(corpus, "text", "id")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pos.view.mapValues(_.size.toLong).toMap === tf)
  }

  test("phrase search counts consecutive occurrences, incl. overlaps") {
    val d = docs(
      (1L, "a a a b"),        // "a a" occurs at 1 and 2 (overlapping)
      (2L, "a b a b"),        // never consecutive
      (3L, "a a"),
      (4L, "a"))              // shorter than the phrase
    val r = Search.phraseTopK(d, "text", "id", Seq("a", "a"), 10)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r === Seq((1L, 2L), (3L, 1L)))
    // single-token phrase degenerates to tf ranking of that term
    val single = Search.phraseTopK(d, "text", "id", Seq("a"), 10)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(single === Seq((1L, 3L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }

  test("scan-side phrase count agrees with positional-index intersection") {
    val phrase = Seq("hash", "scan")
    // serve the phrase from the index: positions of term i, shifted by
    // -i, intersected across terms = phrase start positions
    val idx = Search.positionalIndex(corpus, "text", "id")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[Long](2))
      .toMap
    val docsWithAll = idx.keys.filter(k => phrase.contains(k._1))
      .map(_._2).toSeq.distinct
      .filter(id => phrase.forall(t => idx.contains((t, id))))
    val served = docsWithAll.map { id =>
      val starts = phrase.zipWithIndex
        .map { case (t, i) => idx((t, id)).map(_ - i).toSet }
        .reduce(_ intersect _)
      id -> starts.size.toLong
    }.filter(_._2 > 0).toMap
    val direct = Search.phraseTopK(corpus, "text", "id", phrase, 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(direct === served)
  }

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("id", "text")

  test("degenerate inputs rejected") {
    intercept[IllegalArgumentException] {
      Search.conjunctiveTopK(corpus, "text", "id", Seq.empty, 5)
    }
    intercept[IllegalArgumentException] {
      Search.conjunctiveTopK(corpus, "text", "id", Seq("a", "a"), 5)
    }
  }

  test("bm25: hand-computed scores, disjunctive match, length penalty") {
    // corpus: N=4 docs with text, Σdl = 5+5+3+2 = 15, avgdl = 3.75
    // df(spark)=1 → idf = floor(log2(4/1)) = 2
    // df(join)=3  → idf = floor(log2(4/3)) = floor(log2(1)) = 0
    val got = Search.bm25TopK(corpus, "text", "id",
        Seq("spark", "join"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def part(tf: Double, dl: Double, idf: Double): Double =
      if (tf == 0) 0.0
      else idf * (tf * 2.25 / (tf + 1.25 * (0.25 + 0.75 * (dl / 3.75))))
    // doc 1: spark tf=1 dl=5, join tf=2 (idf 0 → contributes nothing)
    val want1 = part(1, 5, 2) + part(2, 5, 0)
    assert(got(1L) === want1)
    // docs 2 and 3 match only 'join' (idf 0) → score 0 → filtered out
    assert(!got.contains(2L) && !got.contains(3L) && !got.contains(4L))
    // length normalization: the same tf in a SHORTER doc scores higher.
    // (filler docs keep df < N — at df = N the integer idf is
    // floor(log2(1)) = 0 and the term contributes nothing, by design)
    val short = Seq((1L, "spark a"), (2L, "spark a b c d e f g"),
      (3L, "x y"), (4L, "z w")).toDF("id", "text")
    val s = Search.bm25TopK(short, "text", "id", Seq("spark"), k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1L) > s(2L))
  }

  test("phraseViaIndex agrees with the corpus-scan phrase search") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val idx = Search.positionalIndex(docs, "text", "doc_id")
    for (phrase <- Seq(Seq("value", "fast"), Seq("table", "table"),
        Seq("a", "a", "the"))) {
      val scan = Search.phraseTopK(docs, "text", "doc_id", phrase, k = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val served = Search.phraseViaIndex(idx, "doc_id", phrase, k = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(served === scan, s"phrase $phrase")
    }
  }

  test("frequentPairs: anti-monotonicity — pair support <= min unigram df") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val dfs = docs.filter(col("text").isNotNull)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array_distinct(
          graft.text.TextAnalysis.tokens(col("text")))).as("tok"))
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pairs = graft.text.Itemsets.frequentPairs(docs, "text", "doc_id",
        minSupFrac = 0.2, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (p, n) =>
      val Array(a, b) = p.split("\\|", 2)
      assert(n <= math.min(dfs(a), dfs(b)), s"pair $p support $n")
    }
  }

  test("frequentPairs: Apriori pruning and support counting by hand") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "a c"), (4L, "b z"))
      .toDF("doc_id", "text")
    val got = graft.text.Itemsets.frequentPairs(docs, "text", "doc_id",
        minSupFrac = 0.5, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // dfs a:3 b:3 c:2 z:1, minSup 2 → F={a,b,c}; pair support
    // a|b:2, a|c:2, b|c:1 → only the first two survive
    assert(got === Seq(("a|b", 2L), ("a|c", 2L)))
  }
}
