package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.candidates.Candidates
import graft.explain.CertaExplainer
import graft.functions.TextSim
import graft.matcher.TokenCosineModel
import graft.perturb.Perturb
import graft.schema.PairSchema
import graft.triangles.Triangles

/** Core CERTA dataflow on a hand-built ER fixture (FIXTURES.md §A
  * minimal fixture): 3-attribute entities, deterministic cosine
  * matcher, hand-checkable triangles and perturbation counts.
  */
class CertaCoreSpec extends SparkSpec {

  import spark.implicits._

  private val ps = PairSchema.default

  // Left/right sources: names chosen so token-cosine match/non-match
  // structure is obvious (shared tokens = match).
  private def lsource: DataFrame = Seq(
    (0L, "alpha beta gamma", "rome"),
    (1L, "delta epsilon zeta", "paris"),
    (2L, "eta theta iota", "berlin"),
    (3L, "alpha beta gamma", "rome"),
    (4L, "kappa lambda mu", "madrid")
  ).toDF("id", "name", "city")

  private def rsource: DataFrame = Seq(
    (0L, "alpha beta gamma", "rome"),
    (1L, "delta epsilon zeta", "paris"),
    (2L, "nu xi omicron", "london"),
    (3L, "kappa lambda mu", "madrid"),
    (4L, "eta theta iota", "berlin")
  ).toDF("id", "name", "city")

  private def rec(src: DataFrame, id: Long): DataFrame = src.filter(col("id") === id)

  test("TextSim.cosineBags matches the reference cs() semantics") {
    assert(math.abs(TextSim.cosineBags("a b c", "a b c") - 1.0) < 1e-12)
    assert(TextSim.cosineBags("a b", "c d") === 0.0)
    assert(TextSim.cosineBags("", "a") === 0.0)
    // 2 shared of 3 tokens each: 2 / (sqrt(3)*sqrt(3))
    assert(math.abs(TextSim.cosineBags("a b c", "a b d") - 2.0 / 3.0) < 1e-12)
    // bag (not set) semantics: repeated tokens count
    assert(math.abs(TextSim.cosineBags("a a", "a") - 1.0) < 1e-12)
  }

  test("PairSchema prefix helpers and composite-id codec round-trip") {
    val pair = ps.assemblePair(rec(lsource, 0), rsource.filter(col("id") === 1))
    assert(pair.columns.toSet ===
      Set("ltable_id", "ltable_name", "ltable_city", "rtable_id", "rtable_name", "rtable_city"))
    val withId = pair.withColumn("id", ps.pairId(col("ltable_id"), col("rtable_id")))
    assert(withId.select("id").head().getString(0) === "0@0#1@1")
    val stripped = ps.stripPrefix(ps.selectPrefixed(withId, "ltable_"), "ltable_")
    assert(stripped.columns.toSeq === Seq("id", "name", "city"))
  }

  test("mergeSources resolves pair ids through broadcast equi-joins") {
    val pairs = Seq((0L, 0L, 1), (1L, 2L, 0)).toDF("ltable_id", "rtable_id", "label")
    val merged = ps.mergeSources(pairs, lsource, rsource)
    assert(merged.count() === 2)
    val row = merged.filter(col("label") === 1).head()
    assert(row.getAs[String]("ltable_name") === "alpha beta gamma")
    assert(row.getAs[String]("rtable_name") === "alpha beta gamma")
  }

  test("Triangles.discover finds exactly the expected mixed triangles") {
    // support pairs: (l0,r0)=match, (l1,r0)=nomatch, (l0,r2)=nomatch
    val support = Seq(
      ("0@0#1@0", 1),
      ("0@1#1@0", 0),
      ("0@0#1@2", 0)
    ).toDF("id", "label")
    val tri = Triangles.discover(support).collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSet
    // left-open: pos(l0,r0) ⋈ neg(l1,r0) on pivot r0 → <0@0, 1@0, 0@1>
    // right-open: pos(l0,r0) ⋈ neg(l0,r2) on pivot l0 → <1@0, 0@0, 1@2>
    assert(tri === Set(("0@0", "1@0", "0@1"), ("1@0", "0@0", "1@2")))
  }

  test("Perturb.forDepth fan-out and copy semantics (class 1)") {
    val tri = Seq(("0@0", "1@0", "0@1")).toDF("u", "v", "w")
    val pert = Perturb.forDepth(tri, lsource, rsource, depth = 1, classToExplain = 1)
    val rows = pert.collect()
    // 2 free-side attrs (name, city) → C(2,1) = 2 perturbations
    assert(rows.length === 2)
    val byAttr = rows.map(r => (r.getAs[Seq[String]]("alteredAttributes").head, r)).toMap
    // perturbing ltable_name copies l1's name into l0's record
    val nameRow = byAttr("ltable_name")
    assert(nameRow.getAs[String]("ltable_name") === "delta epsilon zeta")
    assert(nameRow.getAs[String]("ltable_city") === "rome")
    assert(nameRow.getAs[Seq[String]]("droppedValues") === Seq("alpha beta gamma"))
    assert(nameRow.getAs[Seq[String]]("copiedValues") === Seq("delta epsilon zeta"))
    // pivot side untouched
    assert(nameRow.getAs[String]("rtable_name") === "alpha beta gamma")
    assert(nameRow.getAs[String]("triangle") === "0@0 1@0 0@1")
  }

  test("Perturb.forDepth swaps free and donor for class 0") {
    val tri = Seq(("0@0", "1@0", "0@1")).toDF("u", "v", "w")
    val pert = Perturb.forDepth(tri, lsource, rsource, depth = 1, classToExplain = 0)
    val byAttr = pert.collect()
      .map(r => (r.getAs[Seq[String]]("alteredAttributes").head, r)).toMap
    // free record is w (= l1), donor u (= l0)
    val nameRow = byAttr("ltable_name")
    assert(nameRow.getAs[String]("ltable_name") === "alpha beta gamma")
    assert(nameRow.getAs[Seq[String]]("droppedValues") === Seq("delta epsilon zeta"))
  }

  test("candidate search returns polarity-filtered, similarity-ordered support") {
    val model = TokenCosineModel()
    val cands = Candidates.findCandidates(
      rec(lsource, 0), rsource, probeIsLeft = true, findPositives = true,
      model = model, numCandidates = 2)
    val got = cands.select("rtable_id", "match_score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    // only r0 shares tokens with l0 ("alpha beta gamma rome")
    assert(got.keySet === Set(0L))
    assert(got(0L) === 1.0)
  }

  test("LSH-blocked candidate search: subset of exhaustive, full recall on dups") {
    import graft.candidates.{CrossJoinGenerator, LshBlockingGenerator, SampleGenerator}
    val probe = Seq((0L, "alpha beta gamma delta epsilon", "rome"))
      .toDF("id", "name", "city")
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon", "rome"),  // exact dup
      (1L, "alpha beta gamma delta epsilon", "rome"),  // exact dup
      (2L, "alpha beta gamma delta epsilon", "paris"), // near dup
      (3L, "zeta eta theta iota kappa", "london"),
      (4L, "lambda mu nu xi omicron", "berlin"),
      (5L, "pi rho sigma tau upsilon", "madrid")
    ).toDF("id", "name", "city")
    val model = TokenCosineModel()
    def ids(gen: graft.candidates.CandidateGenerator): Set[Long] =
      Candidates.findCandidates(probe, corpus, probeIsLeft = true,
        findPositives = true, model = model, numCandidates = 6, gen = gen)
        .select("rtable_id").collect().map(_.getLong(0)).toSet
    val exhaustive = ids(CrossJoinGenerator)
    val blocked = ids(LshBlockingGenerator())
    // blocking can only prune — never invent — candidates
    assert(blocked.subsetOf(exhaustive))
    // records sharing every shingle with the probe collide on every
    // band: exact duplicates are guaranteed recall
    assert(blocked.contains(0L) && blocked.contains(1L))
    assert(blocked.size.toDouble / exhaustive.size >= 2.0 / 3.0)
    // the bounded sampler yields a deterministic subset of the corpus
    val sampled = Candidates.findCandidates(probe, corpus, probeIsLeft = true,
      findPositives = false, model = model, numCandidates = 6,
      gen = SampleGenerator(maxCandidates = 3))
    assert(sampled.count() <= 3)
    // amortized variant: prekeyed band keys (cached caller-side) give
    // exactly the per-call generator's results
    val keyed = LshBlockingGenerator.withBandKeys(corpus).cache()
    try {
      keyed.count()
      val prekeyed = ids(LshBlockingGenerator(prekeyed = Map(corpus -> keyed)))
      assert(prekeyed === blocked)
    } finally keyed.unpersist(true)
  }

  test("explainer runs end-to-end with the LSH-blocked generator") {
    import graft.candidates.LshBlockingGenerator
    val model = TokenCosineModel()
    // explain a NON-match: pc = 0 → the support search hunts positives
    // (similar records) — the polarity LSH blocking is built for
    val explainer = new CertaExplainer(lsource, rsource,
      candidateGen = LshBlockingGenerator())
    val result = explainer.explain(rec(lsource, 0), rec(rsource, 2), model,
      numTriangles = 6)
    assert(result.saliency.columns.nonEmpty)
    val sal = result.saliency.collect().map(r =>
      r.getAs[String]("attribute") -> r.getAs[Double]("saliency")).toMap
    assert(sal.keySet === Set("ltable_name", "ltable_city", "rtable_name", "rtable_city"))
    assert(result.triangles.count() > 0)
  }

  test("AutoSelect default resolves per the cost rule with identical outputs") {
    import graft.candidates.{CrossJoinGenerator, LshBlockingGenerator}
    val model = TokenCosineModel()
    def fingerprint(e: graft.explain.Explanation): (Seq[(String, Double)], Seq[(String, Double)]) = (
      e.saliency.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq.sorted,
      e.pss.collect().map(r => (r.getAs[String]("attrSet"), r.getAs[Double]("pos"))).toSeq.sorted)
    // expectedBatch = 1, cheap scorer → the AutoSelect default IS the
    // reference-exact cross scan
    val auto1 = new CertaExplainer(lsource, rsource)
    val cross = new CertaExplainer(lsource, rsource,
      candidateGen = CrossJoinGenerator)
    try assert(
      fingerprint(auto1.explain(rec(lsource, 0), rec(rsource, 0), model, numTriangles = 6)) ===
      fingerprint(cross.explain(rec(lsource, 0), rec(rsource, 0), model, numTriangles = 6)))
    finally auto1.close()
    // expectedBatch ≥ 2 on an UNDER-GATE corpus: the size gate keeps
    // the cross scan (blocking a 5-row source can empty the support
    // set), so outputs still equal the cross path; the blocked-regime
    // explainer run is pinned by the explicit-generator test above and
    // the gate-disabled resolution by InvariantsSpec
    val autoBatch = new CertaExplainer(lsource, rsource, expectedBatch = 8)
    val cross2 = new CertaExplainer(lsource, rsource,
      candidateGen = CrossJoinGenerator)
    try assert(
      fingerprint(autoBatch.explain(rec(lsource, 0), rec(rsource, 2), model, numTriangles = 6)) ===
      fingerprint(cross2.explain(rec(lsource, 0), rec(rsource, 2), model, numTriangles = 6)))
    finally autoBatch.close()
    // suppress the unused-import style warning for the blocked twin
    val _ = LshBlockingGenerator
  }

  test("end-to-end explain on a matched pair") {
    val model = TokenCosineModel()
    val explainer = new CertaExplainer(lsource, rsource)
    val result = explainer.explain(rec(lsource, 0), rec(rsource, 0), model,
      numTriangles = 6)

    val sal = result.saliency.collect().map(r =>
      r.getAs[String]("attribute") -> r.getAs[Double]("saliency")).toMap
    // one saliency entry per pair attribute
    assert(sal.keySet === Set("ltable_name", "ltable_city", "rtable_name", "rtable_city"))
    sal.values.foreach(v => assert(v >= 0.0 && v <= 1.0 + 1e-9))

    // pss values are probabilities
    val pss = result.pss.collect()
    assert(pss.nonEmpty)
    pss.foreach { r =>
      val p = r.getAs[Double]("pos")
      assert(p >= 0.0 && p <= 1.0 + 1e-9)
    }

    // cf summary is an antichain: no member is a subset of another
    val sets = result.cfSummary.collect()
      .map(_.getAs[Seq[String]]("alteredAttributes").toSet)
    for (a <- sets; b <- sets if a != b) assert(!a.subsetOf(b) || !b.subsetOf(a))

    // every cf example actually flips the prediction: re-predicting the
    // cf pair must give match_score < 0.5 (original class was 1)
    val cfPairs = result.cfExamples
      .select((lsource.columns.filter(_ != "id").map(c => col("ltable_" + c)) ++
        rsource.columns.filter(_ != "id").map(c => col("rtable_" + c))).toIndexedSeq: _*)
    if (cfPairs.count() > 0) {
      val rescored = model.predict(cfPairs)
      assert(rescored.filter(col("match_score") >= 0.5).count() === 0)
    }
  }
}
