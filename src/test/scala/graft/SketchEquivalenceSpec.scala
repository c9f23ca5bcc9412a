package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.{MinHashSignature, SimHash64, TextSim, TokenBagCosine}

/** The single-pass sketch expressions must agree bit-for-bit with their
  * declarative (built-in-fold) twins, and the codegen'd cosine with the
  * reference UDF — these twins are what the DuckDB oracle checks, so
  * equivalence here transfers oracle coverage to the fast path.
  */
class SketchEquivalenceSpec extends SparkSpec {

  import spark.implicits._

  private def texts: DataFrame = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "a b"),
    (2L, "single"),
    (3L, "x y z x y z x y z"),
    (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
  ).toDF("id", "text")

  test("minhash expression equals the declarative md5-min fold") {
    val cmp = texts.select(
      MinHashSignature(col("text"), 4, 3).as("fast"),
      array((0 until 4).map(i => Dedup.minhashColumn(col("text"), i, 3)): _*).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("winnow sketch expression equals the declarative window-min fold") {
    // fixture docs + the real corpus sample shapes: ties inside a
    // window, docs shorter than one window, docs shorter than one gram
    val wide = texts.union(Seq(
      (5L, "r r r r r r r r"),   // all grams identical → one fingerprint
      (6L, "p q p q p q")        // alternating grams
    ).toDF("id", "text"))
    val cmp = wide.select(
      Dedup.winnowFingerprints(col("text")).as("fast"),
      Dedup.winnowFingerprintsDeclarative(col("text")).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() === 0)
    // and on real fixture documents
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cmp2 = docs.select(
      Dedup.winnowFingerprints(col("text")).as("fast"),
      Dedup.winnowFingerprintsDeclarative(col("text")).as("slow"))
    assert(cmp2.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("portable simhash expression equals the declarative vote fold") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cmp = texts.select(col("text")).union(docs.select(col("text"))).select(
      Dedup.simhashPortable(col("text")).as("fast"),
      Dedup.simhashPortableDeclarative(col("text")).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("simhash expression equals the declarative per-bit fold") {
    val cmp = texts.select(
      SimHash64(col("text")).as("fast"),
      Dedup.simhashDeclarative(col("text")).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("codegen cosine equals the reference UDF") {
    val pairs = texts.as("a").crossJoin(texts.as("b"))
      .select(col("a.text").as("ta"), col("b.text").as("tb"))
    val cmp = pairs.select(
      TokenBagCosine(col("ta"), col("tb")).as("fast"),
      TextSim.cosineUdf(col("ta"), col("tb")).as("slow"))
    assert(cmp.filter(abs(col("fast") - col("slow")) > 1e-12).count() === 0)
  }
}
