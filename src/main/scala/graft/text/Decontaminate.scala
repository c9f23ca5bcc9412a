package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Benchmark decontamination for training corpora — the gate between a
  * crawl and a training set (reference has no equivalent; extension
  * operator for the LLM-data pipeline, same family as q58).
  *
  * Two rules, both oracle-replayable:
  *  - ANY-shared-gram (q58, [[contaminatedAnyShared]]): drop a train
  *    doc sharing any distinct n-gram with the benchmark. Maximal
  *    safety; over-drops docs that merely quote a common phrase.
  *  - OVERLAP FRACTION ([[overlapCensus]] / [[dropContaminated]]): a
  *    doc is contaminated when at least `minFrac` of its DISTINCT
  *    n-grams appear in the benchmark gram set — the GPT-3
  *    appendix-C / modern eval-decontam shape, robust to incidental
  *    phrase collisions while still catching embedded benchmark
  *    passages.
  *
  * Portability: the fraction is integer-quantized
  * (`floor(matched / total * 1e9)`, the Blocking.ratioQ convention) so
  * the threshold compare and the emitted census hash-match a SQL
  * replay exactly — no float-boundary drift.
  *
  * Scale shape: one distinct-gram explode over the train side, one
  * join against the (broadcast when small; benchmark gram sets
  * usually are) benchmark gram table, one per-doc count aggregation.
  * Zero pairs, no self-joins; the benchmark side is read once into a
  * distinct gram set. At 100 TB the train explode is the dominant
  * scan and it is embarrassingly parallel.
  */
object Decontaminate {

  /** Distinct n-gram set of a benchmark frame (one column `g`).
    * Documents shorter than one gram contribute their whole text (the
    * [[Dedup.shingles]] degenerate case) so short benchmark rows are
    * still protected.
    */
  def gramSet(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench.select(explode(array_distinct(
      Dedup.shingles(col(textCol), n))).as("g")).distinct()

  private def quantized(num: Column, den: Column): Column =
    when(den === 0L, lit(0L)).otherwise(
      floor(num.cast("double") / den.cast("double") * lit(1e9))
        .cast("long"))

  /** Per-doc contamination census against a prepared [[gramSet]]:
    * (idCol, n_grams, n_matched, overlap_q) for every train doc with
    * at least one benchmark gram hit. `overlap_q` is the 1e-9
    * quantized fraction of the doc's distinct n-grams found in the
    * benchmark set.
    *
    * One train-side explode feeds BOTH counts through a left join
    * with a hit marker (a separate inner-join branch would run the
    * tokenize+shingle pass twice). The benchmark side carries no
    * broadcast hint: gram sets of real eval suites are usually small
    * enough that Catalyst/AQE broadcasts them on its own, and a
    * benchmark too large for the driver then degrades to a shuffled
    * join instead of failing the job.
    *
    * The benchmark side is re-deduplicated here ([[gramSet]] output is
    * already distinct, but a caller-supplied frame may not be): a
    * duplicate gram row would fan out its matching train rows through
    * the left join and silently inflate n_grams AND n_matched — wrong
    * counts, not just a wrong ratio. Negligible next to the train
    * explode.
    */
  def overlapCensus(train: DataFrame, textCol: String, idCol: String,
      benchGrams: DataFrame, n: Int): DataFrame =
    train.select(col(idCol),
        explode(array_distinct(Dedup.shingles(col(textCol), n))).as("g"))
      .join(benchGrams.select(col("g")).distinct()
        .withColumn("__hit", lit(1)), Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_matched"))
      .filter(col("n_matched") > 0L)
      .withColumn("overlap_q", quantized(col("n_matched"), col("n_grams")))

  /** Train docs contaminated under the ANY-shared-gram rule (q58):
    * ids of docs sharing at least one distinct n-gram with the
    * benchmark.
    */
  def contaminatedAnyShared(train: DataFrame, textCol: String,
      idCol: String, benchGrams: DataFrame, n: Int): DataFrame =
    train.select(col(idCol),
        explode(array_distinct(Dedup.shingles(col(textCol), n))).as("g"))
      .join(benchGrams, Seq("g"), "left_semi")
      .select(col(idCol)).distinct()

  /** Drop train docs whose benchmark n-gram overlap fraction reaches
    * `minFracQ` (1e-9 quantized, e.g. 10% = 100000000L — integer so
    * engine and oracle agree at the boundary exactly).
    */
  def dropContaminated(train: DataFrame, textCol: String, idCol: String,
      benchGrams: DataFrame, n: Int, minFracQ: Long): DataFrame = {
    val bad = overlapCensus(train, textCol, idCol, benchGrams, n)
      .filter(col("overlap_q") >= minFracQ)
      .select(col(idCol))
    train.join(bad, Seq(idCol), "left_anti")
  }
}
