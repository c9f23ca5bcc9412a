package graft.candidates

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextSim
import graft.matcher.ERModel
import graft.schema.PairSchema

/** Support-pair search (reference local_explain.py:82-197): find records
  * of the opposite source that the model pairs with the probe record at
  * the wanted polarity, similarity-ordered so the search terminates
  * early.
  *
  * Spark-first re-expression of the reference's batched driver loop
  * (local_explain.py:112-128): instead of predicting 4k-row pandas
  * slices until k qualify, we
  *   1. cap the candidate space to the reference's total prediction
  *      budget (`batch × 20`) with TakeOrderedAndProject (no full sort,
  *      no full shuffle),
  *   2. score the whole capped set in one distributed pass,
  *   3. compute per-batch qualifying counts (≤ 20 tiny rows on the
  *      driver) and keep exactly the batches the reference would have
  *      consumed.
  * Result set matches the reference's early-exit semantics while doing
  * one job instead of ≤ 20 sequential ones. At 100 TB the crossJoin
  * candidate generator swaps for an LSH blocking join (see
  * graft.dedup.MinHashLsh) — the scoring/early-exit pipeline is
  * unchanged.
  */
object Candidates {

  /** Deterministic stand-in for a seeded random shuffle order. */
  def shuffleKey(a: Column, b: Column, seed: Long): Column =
    xxhash64(a.cast("string"), b.cast("string"), lit(seed))

  /** Row count without a Spark job when the frame folds to a
    * LocalRelation (the batched support paths return bounded
    * LocalRelations, and Catalyst's ConvertToLocalRelation folds
    * projections/filters over them) — the explainer fires dozens of
    * sub-100ms jobs per explanation and each skipped count removes a
    * whole scheduler round-trip. Falls back to a normal count() for
    * anything distributed, so the result is always exactly count().
    */
  private[graft] def boundedCount(df: DataFrame): Long =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.size.toLong
      case _ => df.count()
    }

  /** J3 + A7 + O1 + O2 + P5: candidates for `probe` against `source`.
    *
    * @param probeIsLeft true when the probe is the left record and
    *                    `source` supplies right candidates (reference
    *                    lj=True), false for the dual.
    */
  def findCandidates(
      probe: DataFrame,
      source: DataFrame,
      probeIsLeft: Boolean,
      findPositives: Boolean,
      model: ERModel,
      numCandidates: Int,
      maxPredict: Int = -1,
      seed: Long = 42L,
      batched: Boolean = true,
      schema: PairSchema = PairSchema.default,
      gen: CandidateGenerator = CrossJoinGenerator): DataFrame = {

    // J3, pluggable (SURVEY §4's scale swap): the default
    // CrossJoinGenerator replicates the (single-record) probe against
    // every source record — one BroadcastNestedLoopJoin pass with the
    // probe side explicitly broadcast (without the hint the planner sees
    // only "filtered frame × frame" and picks a CartesianProduct whose
    // task count is |partsL| × |partsR|). LshBlockingGenerator swaps the
    // full scan for a minhash-band collision filter; SampleGenerator
    // bounds it — the scoring/early-exit pipeline below is unchanged.
    val pairs0 = gen.pairs(probe, source, probeIsLeft, schema)
    // O7 prediction cap: seeded pseudo-random subset. xxhash64 of the
    // ids replaces the reference's unseeded sample(frac=1) — same
    // "uniform random order" effect but deterministic across retries
    // and engines (SURVEY.md §7 determinism requirement).
    val pairs =
      if (maxPredict > 0)
        pairs0.orderBy(shuffleKey(col(schema.lid), col(schema.rid), seed)).limit(maxPredict)
      else pairs0

    // A7 similarity of probe text vs the varied side's text.
    val (probeCols, variedCols) = {
      val l = pairs.columns.filter(c => c.startsWith(schema.lprefix) && c != schema.lid)
      val r = pairs.columns.filter(c => c.startsWith(schema.rprefix) && c != schema.rid)
      if (probeIsLeft) (l, r) else (r, l)
    }
    val score = TextSim.tokenCosine(
      TextSim.recordText(probeCols.map(col).toIndexedSeq),
      TextSim.recordText(variedCols.map(col).toIndexedSeq))

    // O1 similarity order: descending when hunting positives
    // (reference ascending = not find_positives). Ties broken by ids for
    // determinism (pandas relies on stable sort of the input order).
    val ordCols: Seq[Column] =
      (if (findPositives) score.desc else score.asc) +:
        Seq(col(schema.lid).cast("string").asc, col(schema.rid).cast("string").asc)

    val batch = numCandidates * 4
    if (!batched) {
      val scored = model.predict(pairs)
      val qual = if (findPositives) col("match_score") > 0.5 else col("match_score") < 0.5
      scored.filter(qual)
    } else {
      // O2 early-exit batching. Budget cap first: the reference never
      // predicts more than 20 batches, so the candidate space collapses
      // to ≤ batch × 20 rows BEFORE scoring — TakeOrderedAndProject, no
      // full sort. The scored, budget-capped set is then small by
      // construction (the reference's own total prediction budget), so
      // batch assignment and the early-exit walk run driver-side over a
      // bounded collect and the result is a LocalRelation: one Spark job
      // total, no cached lineage for downstream consumers to re-trigger
      // and nothing left pinned in the block manager (the round-3 cache
      // here leaked a frame per call across EvalDriver loops).
      val capped = pairs.orderBy(ordCols: _*).limit(batch * 20)
      val scored = model.predict(capped)
      val rows = scored.orderBy(ordCols: _*).collect()
      def qual(r: org.apache.spark.sql.Row): Boolean = {
        val ms = r.getAs[Double]("match_score")
        if (findPositives) ms > 0.5 else ms < 0.5
      }
      // reference splits = min(20, n/batch); we keep a final partial
      // batch (max(1, ...)) so sub-batch-sized sources still yield
      // support — the reference degenerates to empty there.
      val splits = math.min(20L, math.max(1L, rows.length.toLong / batch)).toInt
      // consume batches until numCandidates qualify (reference
      // while len(result) < k && i < splits)
      var cum = 0
      var consumed = 0
      while (cum < numCandidates && consumed < splits) {
        val lo = consumed * batch
        val hi = math.min(rows.length, lo + batch)
        var i = lo
        while (i < hi) { if (qual(rows(i))) cum += 1; i += 1 }
        consumed += 1
      }
      val kept = rows.take(math.min(rows.length, consumed * batch)).filter(qual)
      val spark = probe.sparkSession
      spark.createDataFrame(java.util.Arrays.asList(kept.toIndexedSeq: _*),
        scored.schema)
    }
  }

  /** get_support (reference local_explain.py:162-197): symmetric
    * candidate search for both probe records, balanced to equal size,
    * shuffled (seeded), composite-id tagged, polarity-filtered.
    */
  def support(
      lRecord: DataFrame,
      rRecord: DataFrame,
      lsource: DataFrame,
      rsource: DataFrame,
      classToExplain: Int,
      model: ERModel,
      numTriangles: Int,
      maxPredict: Int = -1,
      useLeft: Boolean = true,
      useRight: Boolean = true,
      useAll: Boolean = false,
      seed: Long = 42L,
      schema: PairSchema = PairSchema.default,
      gen: CandidateGenerator = CrossJoinGenerator): (Boolean, DataFrame) = {

    val findPositives = classToExplain == 0
    val numCandidates = numTriangles / 2
    val spark = lsource.sparkSession

    def empty: DataFrame = {
      import org.apache.spark.sql.types.StructType
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], new StructType())
    }

    // batched results are bounded LocalRelations (budget-capped driver
    // collect inside findCandidates) — counting and re-reading them is
    // free, so nothing is cached here. The rare useAll path returns a
    // lazy distributed frame; its ≤3 recomputations (counts + final
    // consumption) are accepted over pinning an unbounded cache across
    // EvalDriver's per-row explain loop.
    val c4r1 = if (useRight)
      findCandidates(lRecord, rsource, probeIsLeft = true, findPositives, model,
        numCandidates, maxPredict, seed, batched = !useAll, schema, gen)
    else empty
    val c4r2 = if (useLeft)
      findCandidates(rRecord, lsource, probeIsLeft = false, findPositives, model,
        numCandidates, maxPredict, seed, batched = !useAll, schema, gen)
    else empty

    val n1 = if (useRight) boundedCount(c4r1) else 0L
    val n2 = if (useLeft) boundedCount(c4r2) else 0L
    val both = math.min(n1, n2)
    val maxLen = if (both == 0) math.max(n1, n2) else both

    // O6 balance via seeded sample-to-n (reference sample(n=max_len))
    def cap(df: DataFrame, n: Long, have: Long): DataFrame =
      if (have > n)
        df.orderBy(shuffleKey(col(schema.lid), col(schema.rid), seed)).limit(n.toInt)
      else df

    val parts = Seq(
      if (n1 > 0) Some(cap(c4r1, maxLen, n1)) else None,
      if (n2 > 0) Some(cap(c4r2, maxLen, n2)) else None).flatten
    if (parts.isEmpty) return (findPositives, empty)

    // O5 seeded shuffle of the union (reference sample(frac=1))
    val candidates = parts.reduce(_ unionByName _)
      .withColumn("id", schema.pairId(col(schema.lid), col(schema.rid)))
      .withColumn("__shuffle", shuffleKey(col("id"), lit(""), seed + 1))

    val neighborhood =
      if (findPositives) candidates.filter(col("match_score") >= 0.5)
      else candidates.filter(col("match_score") < 0.5)
    (findPositives, neighborhood)
  }
}
