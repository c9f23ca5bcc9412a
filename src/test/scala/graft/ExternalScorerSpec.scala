package graft

import org.apache.spark.sql.functions._
import graft.matcher.ExternalBatchScorer
import graft.schema.PairSchema
import graft.sources.ErSources
import graft.text.TextAnalysis

/** External-model boundary, embedding source, and serialization
  * helpers (the neural-wrapper support surface).
  */
class ExternalScorerSpec extends SparkSpec {

  import spark.implicits._

  test("external batch scorer: per-partition init, batched scoring") {
    val pairs = Seq(
      ("alpha beta", "alpha beta"),
      ("alpha beta", "gamma delta"),
      ("x", "x")
    ).toDF("ltable_name", "rtable_name")
    // deterministic stand-in for an ONNX session: token-overlap fraction
    val scorer = new ExternalBatchScorer(() => { batch =>
      batch.map { case (l, r) =>
        val lt = l.mkString(" ").split(" ").toSet
        val rt = r.mkString(" ").split(" ").toSet
        if (lt.union(rt).isEmpty) 0.0
        else lt.intersect(rt).size.toDouble / lt.union(rt).size
      }
    }, batchSize = 2)
    val scored = scorer.predict(pairs).collect()
    assert(scored.length === 3)
    val byName = scored.map(r =>
      r.getAs[String]("ltable_name") -> r.getAs[Double]("match_score")).toMap
    assert(byName("alpha beta") === 1.0 || byName("alpha beta") === 0.0)
    assert(byName("x") === 1.0)
    scored.foreach(r => assert(math.abs(
      r.getAs[Double]("match_score") + r.getAs[Double]("nomatch_score") - 1.0) < 1e-12))
  }

  test("neural-scorer example: model file per partition, lifecycle, sane scores") {
    import graft.matcher.NeuralScorerExample
    val model = java.nio.file.Files.createTempFile("weights", ".bin").toString
    NeuralScorerExample.writeWeights(model)
    NeuralScorerExample.sessionsOpened.set(0)
    NeuralScorerExample.sessionsClosed.set(0)

    val pairs = Seq(
      ("alpha beta gamma", "alpha beta gamma"),
      ("alpha beta gamma", "omega psi chi"),
      ("delta", "delta")
    ).toDF("ltable_name", "rtable_name").repartition(2)
    val scored = NeuralScorerExample.scorer(model, batchSize = 2)
      .predict(pairs).collect()
    assert(scored.length === 3)
    // probabilities, complementary scores
    scored.foreach { r =>
      val p = r.getAs[Double]("match_score")
      assert(p > 0.0 && p < 1.0)
      assert(math.abs(p + r.getAs[Double]("nomatch_score") - 1.0) < 1e-12)
    }
    // identical texts embed identically → cosine 1 → sigmoid(4); the
    // disjoint pair lands strictly lower
    val byR = scored.map(r =>
      r.getAs[String]("rtable_name") -> r.getAs[Double]("match_score")).toMap
    val pIdentical = 1.0 / (1.0 + math.exp(-4.0))
    assert(math.abs(byR("delta") - pIdentical) < 1e-12)
    assert(math.abs(byR("alpha beta gamma") - pIdentical) < 1e-12)
    assert(byR("omega psi chi") < pIdentical)
    // lifecycle: one session per non-empty partition, every one closed
    assert(NeuralScorerExample.sessionsOpened.get() >= 1)
    assert(NeuralScorerExample.sessionsOpened.get() ===
      NeuralScorerExample.sessionsClosed.get())
    // determinism across runs (fresh sessions, same weights)
    val again = NeuralScorerExample.scorer(model, batchSize = 2)
      .predict(pairs).collect()
      .map(r => r.getAs[String]("rtable_name") -> r.getAs[Double]("match_score")).toMap
    assert(again === byR)
  }

  test("embedding text source loads a broadcast word-vector map") {
    val p = java.nio.file.Files.createTempFile("glove", ".txt")
    java.nio.file.Files.writeString(p, "hello 0.1 0.2 0.3\nworld 0.4 0.5 0.6\n")
    val b = graft.sources.ErSources.readEmbeddingText(spark, p.toString)
    assert(b.value.keySet === Set("hello", "world"))
    assert(b.value("hello").toSeq === Seq(0.1f, 0.2f, 0.3f))
  }

  test("ditto serialization emits COL/VAL segments") {
    val df = Seq(("widget", 5)).toDF("name", "size")
    val out = df.select(TextAnalysis.dittoSerialize(
      Seq("name" -> col("name"), "size" -> col("size"))).as("s"))
      .head().getString(0)
    assert(out === "COL name VAL widget COL size VAL 5")
  }

  test("tf-idf summarization keeps the rare tokens under the cap") {
    val docs = Seq(
      (0L, "common common common rare1 rare2"),
      (1L, "common common common common common"),
      (2L, "common filler filler"),
      (3L, "tiny doc")
    ).toDF("doc_id", "text")
    val trimmed = TextAnalysis.tfIdfSummarize(docs, "text", maxTokens = 2)
      .orderBy("doc_id").collect().map(_.getString(1))
    // doc 0: rare1/rare2 have the highest idf → survive the cap
    assert(trimmed(0) === "rare1 rare2")
    // doc 2: the rarer filler tokens beat the ubiquitous one
    assert(trimmed(2) === "filler filler")
    // docs at or under the cap pass through untouched
    assert(trimmed(3) === "tiny doc")
  }
}
