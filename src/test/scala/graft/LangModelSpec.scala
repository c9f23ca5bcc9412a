package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.text.LangModel

/** Hand-computed fixtures for the bigram-LM surprisal operator. */
class LangModelSpec extends SparkSpec {

  import spark.implicits._

  // corpus: c1(x)=4, c1(y)=1, c1(z)=1; c2(x,x)=2, c2(x,y)=1
  // cost(x,x) = floor(log2(4 div 2)) = 1; cost(x,y) = floor(log2(4 div 1)) = 2
  private def corpus = Seq(
    (1L, "x x x"), (2L, "x y"), (3L, "z")).toDF("doc_id", "text")

  test("bigramModel: hand-computed integer-log2 costs") {
    val m = LangModel.bigramModel(corpus, "text")
      .select("w1", "w2", "c2", "c1", "cost")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(m === Set(("x", "x", 2L, 4L, 1L), ("x", "y", 1L, 4L, 2L)))
  }

  test("withBigramSurprisal: per-doc sums, zero-bigram doc kept at 0") {
    val out = LangModel.withBigramSurprisal(corpus, "text", "doc_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // d1: bigrams (x,x),(x,x) → surprisal 2, mean 1
    // d2: (x,y) → surprisal 2, mean 2; d3: no bigrams → all 0
    assert(out === Array((1L, 2L, 2L, 1L), (2L, 1L, 2L, 2L), (3L, 0L, 0L, 0L)))
  }

  test("external model: unseen bigrams score 0, model bigrams score") {
    val model = LangModel.bigramModel(corpus, "text")
    val fresh = Seq((9L, "x y q q")).toDF("doc_id", "text")
    val out = LangModel.withBigramSurprisal(fresh, "text", "doc_id",
        model = Some(model))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // bigrams: (x,y) cost 2 from the model; (y,q),(q,q) unseen → 0
    assert(out === Seq((9L, 3L, 2L)))
  }

  test("explicit self-model scoring equals the implicit training path") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val self = LangModel.withBigramSurprisal(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val explicitModel = LangModel.bigramModel(docs, "text")
    val ext = LangModel.withBigramSurprisal(docs, "text", "doc_id",
        model = Some(explicitModel))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(self === ext)
  }

  test("costs are non-negative for every corpus bigram (c2 <= c1)") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val m = LangModel.bigramModel(docs, "text")
    assert(m.filter(col("cost") < 0 || col("c2") > col("c1")).count() === 0L)
  }
}
