package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import graft.queries.{ErQueries, PipelineQueries, Relational}

/** Physical-plan quality gates: the properties that decide whether these
  * plans survive a 100× scale-up — filters reaching the parquet scan,
  * dimensions broadcast instead of shuffled, no cartesian products where
  * an equi-join exists, whole-stage codegen covering the hot operators.
  * A plan regression (e.g. a lost pushdown after a refactor) fails here
  * long before it shows up in a benchmark.
  */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q02: filters push into the parquet scan") {
    val p = plan(Relational.q02FilterRevenue(spark, dir))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThanOrEqual(l_discount"), p)
    // timestamp + numeric filters present at the scan, not only post-scan
    assert(p.contains("LessThan(l_quantity,24.0)"), p)
  }

  test("q03/q04: dimension joins broadcast, no shuffle of the small side") {
    val p3 = plan(Relational.q03JoinAgg(spark, dir))
    assert(p3.contains("BroadcastHashJoin"), p3)
    val p4 = plan(Relational.q04RegionRevenue(spark, dir))
    assert(p4.contains("BroadcastHashJoin"), p4)
    assert(!p4.contains("CartesianProduct"), p4)
  }

  test("q03: dim join degrades to a shuffled join when broadcast is off") {
    // the 100 TB posture: customer scales with SF, so q03 carries NO
    // broadcast hint — below the threshold Catalyst broadcasts, above
    // it the join MUST fall back to a shuffled join with identical
    // results (an explicit hint would never degrade and would OOM)
    val before = Relational.q03JoinAgg(spark, dir).collect().map(_.toString).toSeq
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Relational.q03JoinAgg(spark, dir)
      val p = plan(df)
      assert(!p.contains("BroadcastHashJoin"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(df.collect().map(_.toString).toSeq === before)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("AQE splits a manufactured hot-key join partition (skew=true)") {
    import org.apache.spark.sql.functions._
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.getOption(k))
    try {
      // force a shuffled join and lower the skew thresholds so the
      // fixture-scale hot key trips the same split a 100 TB hot key
      // would at the defaults
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // 50% of rows land on key 0; the rest spread
      val left = spark.range(0L, 200000L).select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id")).as("k"),
        md5(col("id").cast("string")).as("payload"))
      val right = spark.range(0L, 1000L).select(col("id").as("k"))
      val j = left.join(right, "k")
      // collect() drives THIS frame's queryExecution (count() would
      // plan its own), so the final adaptive plan is inspectable after
      val n = j.collect().length
      assert(n === 100000 + 500) // key 0 matches 100k rows; odd ids < 1000 match once
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p.take(4000))
    } finally keep.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("q02: scan reads only referenced columns (pruning)") {
    val p = plan(Relational.q02FilterRevenue(spark, dir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_extendedprice"), readSchema)
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_returnflag"), readSchema)
  }

  test("q20: blocked ER pairs use a hash equi-join on the blocking key") {
    val p = plan(ErQueries.q20ErPairs(spark, dir))
    assert(p.contains("HashJoin"), p) // broadcast or shuffled — never nested-loop
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q105: knowledge injection is one codegen'd projection, no UDF") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$dir/part.parquet")
      .select(graft.text.Knowledge.injectKnowledge(col("p_name")).as("dk"))
    val p = plan(df)
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("udf"), p)
    // higher-order transform/aggregate evaluate interpreted (no
    // doGenCode) but stay inside ONE projection over the scan
    assert(p.linesIterator.count(_.startsWith("Project")) <= 1, p)
    assert(!p.contains("Exchange"), p) // scan-local: no shuffle anywhere
  }

  test("q106: history probe is a hash equi-join on (band, key)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val hist = graft.dedup.IncrementalDedup.emptyHistory(spark, "doc_id")
    val r = graft.dedup.IncrementalDedup.nearDupNewDocs(
      hist, docs, "text", "doc_id")
    try {
      val p = plan(r.survivors)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    } finally r.close()
  }

  test("q01: aggregation is partial (map-side) before the shuffle") {
    val p = plan(Relational.q01PricingSummary(spark, dir))
    // two HashAggregate stages around one exchange = partial+final
    val tree = p.linesIterator.takeWhile(!_.startsWith("(1)")).toSeq
    assert(tree.count(_.contains("HashAggregate")) >= 2, p)
    assert(tree.exists(_.contains("Exchange")), p)
  }

  test("q40: brute-force ANN is TakeOrdered, not a global sort") {
    val p = plan(PipelineQueries.q40EmbedTopK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("relational plans carry no load-time round-robin exchange (fan-out is opt-in)") {
    // round 3 fanned EVERY table out at load; the Exchange polluted all
    // relational plans and re-executed in every uncached recomputation
    val p2 = plan(Relational.q02FilterRevenue(spark, dir))
    assert(!p2.contains("RoundRobinPartitioning"), p2)
    val p7 = plan(Relational.q07TopK(spark, dir))
    assert(!p7.contains("RoundRobinPartitioning"), p7)
  }

  test("q41: portable LSH buckets hash nothing per row (literal weights)") {
    val p = plan(PipelineQueries.q41EmbedLsh(spark, dir))
    assert(!p.toLowerCase.contains("md5"), p)
  }

  test("q37: both census legs read the cached signature pass") {
    val df = PipelineQueries.q37Simhash(spark, dir)
    val p = plan(df)
    // the distinct-count leg and the self-join (two sides) must all hit
    // the InMemoryRelation, never re-derive the 60-bit vote fold
    assert(p.contains("InMemoryTableScan"), p)
    df.sparkSession.catalog.clearCache()
  }

  test("q32: shingle-array joins are shuffled hash, never driver broadcast") {
    // the shingle frame is the WIDE side (per-doc k-gram arrays); AQE's
    // cold-cache estimates sometimes chose to BROADCAST it — a
    // single-threaded driver collect+build observed as a bimodal
    // 3 s / 60+ s census. The shuffle_hash hint pins the scale-safe
    // shape; this gate runs the query so the AQE-final plan is asserted.
    val df = PipelineQueries.q32NearDups(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    // the verify stage melts pairs to sides and joins the shingle frame
    // exactly once — that single id-keyed join must be shuffled hash
    assert("ShuffledHashJoin".r.findAllIn(p).length >= 1, p.take(4000))
    val broadcastKeys = "BroadcastHashJoin \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(!broadcastKeys.exists(k => k.contains("__id#")),
      broadcastKeys.mkString("; "))
    df.sparkSession.catalog.clearCache()
  }

  test("q43: near-dup census self-join reads the cached bucketing pass") {
    val df = PipelineQueries.q43EmbedNearDup(spark, dir)
    val p = plan(df)
    assert(p.contains("InMemoryTableScan"), p)
    df.sparkSession.catalog.clearCache()
  }

  test("LSH-blocked candidate generation is a scan filter — no nested-loop join") {
    import org.apache.spark.sql.functions.col
    import graft.candidates.{CrossJoinGenerator, LshBlockingGenerator}
    import graft.schema.PairSchema
    val src = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").as("id"), col("p_name").as("name"),
        col("p_brand").as("brand"))
    val probe = src.filter(col("id") === 1)
    // default J3 is the documented BroadcastNestedLoopJoin (one pass,
    // probe broadcast)…
    val cross = plan(CrossJoinGenerator.pairs(probe, src, probeIsLeft = true,
      PairSchema.default))
    assert(cross.contains("BroadcastNestedLoopJoin"), cross)
    // …the blocked generator replaces it entirely: the probe's band keys
    // are literals, candidates come from a scan-stage filter, the probe
    // columns attach as literals — no join operator of any kind remains
    val blocked = plan(LshBlockingGenerator().pairs(probe, src,
      probeIsLeft = true, PairSchema.default))
    assert(!blocked.contains("BroadcastNestedLoopJoin"), blocked)
    assert(!blocked.contains("CartesianProduct"), blocked)
    assert(!blocked.contains("Join"), blocked)
  }

  test("prekeyed blocked generation reads the cached keyed frame, no sketch recompute") {
    import org.apache.spark.sql.functions.col
    import graft.candidates.LshBlockingGenerator
    import graft.schema.PairSchema
    val src = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").as("id"), col("p_name").as("name"),
        col("p_brand").as("brand"))
    val probe = src.filter(col("id") === 1)
    val batch = LshBlockingGenerator.forBatch(Seq(src))
    try {
      val p = plan(batch.generator.pairs(probe, src, probeIsLeft = true,
        PairSchema.default))
      // the candidate side comes straight from the cached band-keyed
      // frame — the per-call sketch pass (minhash over every source
      // row) must be gone from the EXECUTED plan. InMemoryRelation
      // echoes its build lineage below the cache boundary, so only the
      // plan above it counts.
      assert(p.contains("InMemoryTableScan"), p)
      val aboveCache = p.split("InMemoryRelation").head
      assert(!aboveCache.toLowerCase.contains("minhash"), p)
      assert(!p.contains("Join"), p)
    } finally {
      batch.close()
      assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    }
  }

  test("vertex-resolution id filters push into the parquet scan") {
    // the shape Perturb.resolve issues: a typed id-IN filter on the
    // source — it must reach PushedFilters, which a cast on the column
    // side would block
    val part = spark.read.parquet(s"$dir/part.parquet")
    val p = plan(part.filter(org.apache.spark.sql.functions.col("p_partkey")
      .isin(Seq(1L, 2L, 3L).map(x => x: Any): _*)))
    assert(p.contains("PushedFilters: [In(p_partkey"), p)
  }

  test("q54: bloom probe is a codegen expression, not a UDF") {
    import org.apache.spark.sql.functions.{col, length}
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val probe = graft.dedup.IncrementalDedup.bloomNewDocs(
      d.filter(length(col("source")) === 4),
      d.filter(length(col("source")) === 5),
      "text", expectedItems = 1000L)
    val p = plan(probe)
    assert(p.contains("might_contain"), p)
    assert(!p.contains("UDF"), p)
  }

  test("q39: winnowing census reads the cached sketch pass once") {
    val df = PipelineQueries.q39Winnow(spark, dir)
    val p = plan(df)
    // three census legs (per-doc sums, distinct fp, shared fp) must all
    // hit the InMemoryRelation, never re-run the window-min sketch
    assert(p.contains("InMemoryTableScan"), p)
    df.sparkSession.catalog.clearCache()
  }

  test("q50: salted aggregation is two-phase (scatter then merge)") {
    val p = plan(PipelineQueries.q50SaltedHitters(spark, dir))
    val tree = p.linesIterator.takeWhile(!_.startsWith("(1)")).toSeq
    // phase 1 groups on (key, salt), phase 2 on key → at least two
    // aggregate pairs; and the top-k is TakeOrdered, not a global sort
    assert(tree.count(_.contains("HashAggregate")) >= 4, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q95: pure range join plans as a hash join on the cell, not a nested loop") {
    val p = plan(PipelineQueries.q95RangeJoin(spark, dir))
    // without the manufactured cell key this join has no equi condition
    // and the ONLY available plan is a nested-loop scan — the bucketize
    // must surface as a real equi join
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q93: upsert merges with equi joins only — anti for replace, outer for census") {
    val p = plan(PipelineQueries.q93Upsert(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    // corpus-side joins are equi: anti-join replacement + full-outer
    // census; the single nested-loop is the 1-row × 1-row concat of the
    // two aggregate legs, never a data join
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("FullOuter"), p)
    val tree = p.linesIterator.takeWhile(!_.startsWith("(1)")).toSeq
    assert(tree.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
  }

  test("q101: interval overlap plans as a hash join on the cell, not a nested loop") {
    val p = plan(PipelineQueries.q101IntervalOverlap(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q97: curriculum binning assigns bins scan-local — no window operator") {
    val p = plan(PipelineQueries.q97Curriculum(spark, dir))
    // the NTILE formulation would put the whole corpus through ONE
    // unpartitioned window task; the boundary-comparison fold must not
    assert(!p.contains("Window"), p)
  }

  test("q53: the mix-sample hash gate evaluates inside the scan stage") {
    val p = plan(PipelineQueries.q53MixSample(spark, dir))
    // one Filter over the scan, no Exchange before it: the gate is
    // scan-local, which is what makes the sampler free at 100 TB
    val tree = p.linesIterator.takeWhile(!_.startsWith("(1)")).toSeq
    val filterIdx = tree.indexWhere(_.contains("Filter"))
    val exchangeIdx = tree.indexWhere(_.contains("Exchange"))
    assert(filterIdx >= 0, p)
    assert(exchangeIdx < 0 || exchangeIdx < filterIdx, p)
  }

  test("q54: old-half source filter pushes into the parquet scan") {
    val p = plan(PipelineQueries.q54IncrementalDedup(spark, dir))
    // length(source)=4 compiles to a post-scan filter, but the scan must
    // still prune columns: the census needs text/source/doc_id only —
    // n_chars and lang must never be read
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty, p)
    assert(readSchemas.forall(s => !s.contains("n_chars") && !s.contains("lang")), p)
    // the exact leg is an anti hash-join, not a nested loop
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("whole-stage codegen covers the sketch expressions") {
    // direct scan (no load-time fan-out exchange): an AQE-wrapped plan
    // hides codegen markers until stages finalize, which isn't what
    // this gate is about — it asserts the expression itself codegens
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(d.select(graft.functions.MinHashSignature(
      org.apache.spark.sql.functions.col("text"), 4, 3)))
    // formatted mode marks whole-stage-codegen operators with '*'
    assert(p.contains("* Project"), p)
  }

  test("q72: hot-gram set broadcasts when requested; gram census partial-aggregates") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(graft.text.TextAnalysis.dupNgramFraction(
      d, "text", "doc_id", n = 5, minDocs = 5, broadcastHot = true))
    assert(p.contains("BroadcastHashJoin"), p)
    // census leg combines map-side before the gram-key shuffle
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q74: training order has no global sort — range exchange + local sorts only") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(graft.operators.Shard.trainingOrder(d, "doc_id", 7L, 8))
    // formatted mode lists the Exchange's arguments on their own line
    assert(p.contains("rangepartitioning(shard"), p)
    // formatted Sort arguments end in ", <global>, 0" — all must be local
    assert(p.contains("], false, 0"), p)
    assert(!p.contains("], true, 0"), p)
  }

  test("q75: the hashed-bucket weight table broadcasts to the scoring scan") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(graft.text.Importance.targetAffinity(
      d, "text", "doc_id",
      org.apache.spark.sql.functions.col("source") === "src0",
      nBuckets = 256, n = 2))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q76: semantic-dedup candidates join on the cell key — no nested loop") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = plan(graft.similarity.SemDedup.nearDuplicatePairs(
      e, "embedding", "vec_id", threshold = 0.4))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join") && p.contains("bucket"), p)
  }

  test("q80: the count-min estimation join broadcasts the sketch") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val toks = d.select(org.apache.spark.sql.functions.explode(
      graft.text.TextAnalysis.tokens(
        org.apache.spark.sql.functions.col("text"))).as("token"))
    val sk = graft.operators.CountMin.sketch(toks, "token")
    val p = plan(graft.operators.CountMin.estimate(sk, toks, "token"))
    assert(p.contains("BroadcastHashJoin"), p)
    // sketch build partial-aggregates before its one shuffle
    assert(p.contains("HashAggregate"), p)
  }

  test("q78: upsample copies explode in the scan stage — no pre-explode exchange") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(graft.operators.Sampling.upsampleByWeight(
      d, "source", "doc_id", Map("src0" -> 2.5)))
    assert(p.contains("Generate"), p)
    assert(!p.contains("Exchange"), p) // row multiplication is scan-local
  }

  test("q70: fused int8 scoring stays in whole-stage codegen") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = plan(e.select(graft.functions.Int8Cosine(
      org.apache.spark.sql.functions.col("embedding"), Array(1, 2, 3))))
    assert(p.contains("* Project"), p)
    // the declarative twin's higher-order folds would appear as
    // aggregate/transform lambdas — the fused plan carries none
    assert(!p.contains("aggregate("), p)
  }

  test("q209: semantic decontam joins on the cell key — no data×data cartesian") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val bench = e.filter(org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.lit(41L)) === 0L)
    val p = plan(graft.text.Decontaminate.semanticContaminated(
      e, "embedding", "vec_id", bench, "embedding",
      threshold = 0.35, numPlanes = 4, probeBits = 1))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join") && p.contains("bucket"), p)
  }

  test("q210: label propagation is ONE scan-local codegen'd projection " +
      "— no join, no aggregate, no exchange") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val gate = org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.lit(5L))
    val p = plan(graft.similarity.LabelPropagate.knnVote(
      e.filter(gate =!= 0L), e.filter(gate === 0L),
      "embedding", "vec_id", "label", k = 7))
    // the seed rides as reference objects of the generated class (the
    // literal-centroids pattern): the per-row cosines, top-k selection
    // and vote all happen inside the scan's whole-stage codegen. The
    // aggregate form this replaced fell back to sort-based aggregation
    // past 128 groups/task and sorted the full score stream (measured:
    // 205 GB spill at 8.2M rows).
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("HashAggregate"), p)
    assert(p.contains("* Project"), p)
  }

  test("fused vector cosine stays in whole-stage codegen") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = plan(e.select(graft.similarity.Ann.cosine(
      org.apache.spark.sql.functions.col("embedding"),
      org.apache.spark.sql.functions.col("embedding"))))
    assert(p.contains("* Project"), p)
    // the declarative twin's higher-order folds would appear as
    // aggregate/zip_with lambdas — the fused plan carries none
    assert(!p.contains("aggregate("), p)
    assert(!p.contains("zip_with"), p)
  }

  test("q88: phrase prefilter sits below the gram explode; top-k is TakeOrdered") {
    val p = plan(PipelineQueries.q88PhraseSearch(spark, dir))
    // the conservative substring filter must gate the Generate (explode),
    // not run after it — candidate docs only pay the gram expansion
    assert(p.contains("Contains"), p)
    val tree = p.linesIterator.takeWhile(!_.startsWith("(1)")).toSeq
    val gen = tree.indexWhere(_.contains("Generate"))
    // parents print first, so the scan-side filter is the LAST Filter
    // and must sit deeper than the explode
    val filt = tree.lastIndexWhere(_.contains("Filter"))
    assert(gen >= 0 && filt > gen, p)
    assert(p.contains("StringContains"), p) // pushed to the parquet scan
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("GlobalSort"), p)
  }

  test("q90: rollup is Expand + partial aggregation around one exchange") {
    val p = plan(Relational.q90Rollup(spark, dir))
    val tree = p.linesIterator.takeWhile(!_.startsWith("(1)")).toSeq
    assert(tree.exists(_.contains("Expand")), p)
    assert(tree.count(_.contains("HashAggregate")) >= 2, p)
    assert(tree.count(_.contains("Exchange")) <= 2, p) // agg + final sort
  }

  test("q91: pivot aggregates in two bounded passes — dims broadcast") {
    val p = plan(Relational.q91Pivot(spark, dir))
    val tree = p.linesIterator.takeWhile(!_.startsWith("(1)")).toSeq
    // Spark pivots as groupBy(key, pivotCol) then pivot — two agg
    // exchanges whose rows are group-sized, plus the output sort; with
    // explicit values there is NO distinct-values pre-job (which would
    // add a fourth exchange and a separate collect)
    assert(tree.count(l => l.contains("Exchange") && !l.contains("Broadcast")) <= 3,
      p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q107: top-k per group is a partial-merged aggregate, not a window sort") {
    val p = plan(PipelineQueries.q107TopKPerGroup(spark, dir))
    // ObjectHashAggregate appears twice: map-side partial + final — the
    // combine step a window rank cannot have
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2, p)
    assert(!p.contains("Window"), p)
    // exactly one HASH exchange (the group key, carrying ≤ k rows per
    // group per task); the others are the fixture fan-out (round-robin,
    // loadFanned) and the output sort's range exchange — the full row
    // set is never hash-shuffled or sorted
    assert(p.linesIterator.count(
      _.trim.startsWith("Arguments: hashpartitioning")) == 1, p)
  }

  test("q108: canonical dedup shuffles only narrow md5 keys") {
    val p = plan(PipelineQueries.q108CanonicalDedup(spark, dir))
    assert(!p.contains("Join"), p)
    // two hash exchanges, both inherent and both narrow: the exact
    // count-distinct plans two-phase — (canon-key, text-md5) distinct
    // pairs first, then the canon-key group. Every exchanged key is an
    // md5, never the document text.
    val hashes = p.linesIterator
      .filter(_.trim.startsWith("Arguments: hashpartitioning")).toSeq
    assert(hashes.size <= 2, p)
    assert(hashes.forall(l => !l.contains("text#") || l.contains("md5")), p)
  }

  test("q111/q112: literal-folded scoring stays scan-local (no join)") {
    val p1 = plan(PipelineQueries.q111Bm25(spark, dir))
    assert(!p1.contains("Join"), p1)
    // scoring plan is scan → project → TakeOrdered; stats/df jobs run
    // separately before the returned plan and fold in as literals
    assert(p1.contains("TakeOrderedAndProject"), p1)
    assert(p1.linesIterator.count(
      _.trim.startsWith("Arguments: hashpartitioning")) == 0, p1)
    val p2 = plan(PipelineQueries.q112OovNovelty(spark, dir))
    assert(!p2.contains("Join"), p2)
    // one hash exchange: the per-source census
    assert(p2.linesIterator.count(
      _.trim.startsWith("Arguments: hashpartitioning")) == 1, p2)
  }

  test("q113: corpus build plans with no join — rates fold in as literals") {
    val p = plan(PipelineQueries.q113CorpusBuild(spark, dir))
    assert(!p.contains("Join"), p)
    // every hash exchange keys on md5(canon) or source — never raw text
    val hashes = p.linesIterator
      .filter(_.trim.startsWith("Arguments: hashpartitioning")).toSeq
    assert(hashes.forall(l => !l.contains("text#") || l.contains("md5")), p)
  }

  test("q118/q121: fuzzy and set-sim joins are hash equi-joins, never nested loops") {
    // both blocked-similarity joins must plan as equi-joins on the
    // blocking key (deletion variant / prefix token) — a nested-loop or
    // cartesian here means the blocking silently stopped working and
    // the plan is the O(n²) one the operator exists to avoid
    val p118 = plan(PipelineQueries.q118FuzzyJoin(spark, dir))
    assert(!p118.contains("CartesianProduct"), p118)
    assert(!p118.contains("BroadcastNestedLoopJoin"), p118)
    val p121 = plan(PipelineQueries.q121SetSimJoin(spark, dir))
    assert(!p121.contains("CartesianProduct"), p121)
    assert(!p121.contains("BroadcastNestedLoopJoin"), p121)
  }

  test("q120: diff shuffles are NARROW — key + fingerprint, never the wide row") {
    // the reconciliation contract: each side projects to (key, md5)
    // inside its scan, so every exchange in the plan moves ≤ 3 columns
    // however wide the diffed table is
    val df = PipelineQueries.q120TableDiff(spark, dir)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val wide = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike if e.output.size > 3 => e.output.map(_.name)
    }
    assert(wide.isEmpty, s"wide exchanges: $wide")
    assert(df.collect().head.getLong(3) > 0L) // sanity: some rows unchanged
  }

  test("q110: centroid assignment is scan-local — no join, one census shuffle") {
    val p = plan(PipelineQueries.q110CentroidAssign(spark, dir))
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    // one hash exchange for the k-row census; the embeddings themselves
    // never hash-shuffle (centroids ride in as literals)
    assert(p.linesIterator.count(
      _.trim.startsWith("Arguments: hashpartitioning")) == 1, p)
  }

  test("q125: SCD2 apply joins once per batch — hash full-outer, no nested loop") {
    val p = plan(PipelineQueries.q125Scd2(spark, dir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // every join in the plan is the apply's hash FullOuter — nothing
    // else joins (history passes through filter+union). Chained
    // UNMATERIALIZED applies re-plan the earlier apply per reference
    // (dim1 feeds apply 2 as both history and open set), so the join
    // COUNT exceeds the apply count — the contract when chaining in
    // one job is to persist/write between batches, which the
    // streaming twin (q130 scd2Stream) does by construction.
    val joinTypes = p.linesIterator
      .filter(_.trim.startsWith("Join type:")).toSeq
    assert(joinTypes.nonEmpty &&
      joinTypes.forall(_.contains("FullOuter")), p)
  }

  test("q173: kNN graph is a cell equi-join + bounded aggregate — never all-pairs") {
    val p = plan(PipelineQueries.q173KnnGraph(spark, dir))
    // the self-join must key on the bucket — a cartesian/BNLJ here
    // would be the O(n²) scan the cell structure exists to avoid
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // per-node top-k reduces through the ObjectHashAggregate pair
    // (TopKAgg partial+final), not a window rank over a hot node
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("q126: TWAP is one window pass — no join, integer aggregates") {
    val p = plan(PipelineQueries.q126Twap(spark, dir))
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("q129: integrity FK checks are hash anti-joins, never nested loops") {
    val p = plan(PipelineQueries.q129Integrity(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftAnti"), p)
    // the two 1-row total counts ride broadcast nested loop joins by
    // construction (cross of single rows) — make sure no DATA-sized
    // nested loop appears: every BNLJ in this plan must be a cross of
    // aggregated 1-row sides, which surface as BroadcastNestedLoopJoin
    // Cross; anything labelled Inner/LeftOuter there would be a bug
    assert(!p.contains("BroadcastNestedLoopJoin Inner"), p)
  }

  test("q124: Lloyd final assignment is scan-local — no join, integer census only") {
    // the trained centroids ride in as literal vectors exactly like
    // q110's; the corpus never joins or shuffles during assignment
    val p = plan(PipelineQueries.q124Kmeans(spark, dir))
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.linesIterator.count(
      _.trim.startsWith("Arguments: hashpartitioning")) == 1, p)
  }

  test("q135: LM scoring joins are hash equi-joins; no nested loop") {
    val p = plan(PipelineQueries.q135LmSurprisal(spark, dir))
    // model assembly (bigram x unigram) and stream scoring both key on
    // token/bigram equality — at corpus scale nothing may nested-loop
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("hashpartitioning"), p)
  }

  test("q137: anchors broadcast to the corpus scan; top-k is the bounded aggregate") {
    val p = plan(PipelineQueries.q137HardNegatives(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin"), p) // gated anchors x corpus
    assert(p.contains("ObjectHashAggregate"), p)     // TopKAgg, not a window
    assert(!p.contains("Window"), p)
  }

  test("q139: PQ encode + ADC are scan-local — codes via literal codebooks, no join") {
    import graft.similarity.Pq
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val model = Pq.train(e, "vec_id", "embedding",
      dim = 64, m = 2, k = 4, iters = 1)
    val enc = Pq.encode(e, "embedding", model)
    val pe = plan(enc)
    assert(!pe.contains("Join"), pe)
    assert(!pe.contains("Exchange"), pe) // pure projection over the scan
    val probe = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val pq = plan(Pq.adcTopK(enc, "embedding", "vec_id", model, probe,
      k = 10, excludeId = Some(0L)))
    assert(!pq.contains("Join"), pq)
    assert(pq.contains("TakeOrderedAndProject"), pq) // shortlist + rerank
  }

  test("q145/q146: journey analytics shuffle once on the user key, no nested loop") {
    val p5 = plan(PipelineQueries.q145Attribution(spark, dir))
    assert(!p5.contains("CartesianProduct"), p5)
    assert(!p5.contains("BroadcastNestedLoopJoin"), p5)
    assert(p5.contains("Window"), p5)
    val p6 = plan(PipelineQueries.q146Transitions(spark, dir))
    assert(!p6.contains("Join"), p6) // lead window + census only
    assert(p6.contains("Window"), p6)
  }

  test("q148: served phrase search joins postings hash-wise, never nested-loop") {
    val p = plan(PipelineQueries.q148PhraseViaIndex(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q152: the census filter reaches the ORC scan") {
    val p = plan(PipelineQueries.q152OrcRoundtrip(spark, dir))
    assert(p.contains("Scan orc"), p)
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(n_chars,100)"), p)
  }

  test("q154: RAG retrieval is scan-local — chunk explode + literal-vector fold + TakeOrdered") {
    val p = plan(PipelineQueries.q154RagRetrieval(spark, dir))
    assert(!p.contains("Join"), p)
    // the single Exchange is the OPT-IN load fan-out (single-file
    // fixture → spread before the explode); no shuffle follows it
    assert(p.linesIterator.count(_.trim.startsWith("Arguments: roundrobin")) <= 1, p)
    assert(!p.contains("hashpartitioning"), p)
    assert(p.contains("Generate"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q149: Apriori pruning is a broadcast hash SEMI-join, pairs explode scan-local") {
    val p = plan(PipelineQueries.q149FrequentPairs(spark, dir))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Generate"), p) // the per-doc pair explode
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q187: OR-completeness covered joins are equi on (truth, key) — no cartesian") {
    val p = plan(ErQueries.q187OrBlocking(spark, dir))
    // per-key covered joins must be hash equi-joins; the only
    // cross-ish joins are the one-row census assembly at the top
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("hashpartitioning") || p.contains("BroadcastHashJoin"), p)
  }

  test("q190: probed semdedup join stays equi on the probe cell — no nested loop") {
    val p = plan(PipelineQueries.q190SemdedupProbe(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the Hamming fan-out is a scan-local explode feeding the equi-join
    assert(p.contains("Generate"), p)
  }

  test("q191/q192: perceptual dedup never joins row pairs — anti join on the id") {
    val hashed = graft.multimodal.Multimodal.withAverageHash(
      graft.multimodal.Multimodal.synthesizeGroupedPngs(
        spark.range(40).select(org.apache.spark.sql.functions
          .col("id").as("doc_id")), "doc_id"))
    val r = graft.multimodal.Multimodal.perceptualDedup(hashed, "media_id")
    try {
      val p = plan(r.survivors)
      assert(p.contains("LeftAnti"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    } finally r.close()
  }

  test("q197/q198: incremental dedup plans are keyed joins, no cartesians") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("text").isNotNull)
    val hist = docs.filter(col("doc_id") < 25L)
    val batch = docs.filter(col("doc_id") >= 25L)
    val r = graft.dedup.Dedup.incrementalNearDuplicates(hist, batch,
      "text", "doc_id", threshold = 0.7)
    try {
      val p = plan(r.survivors)
      assert(p.contains("LeftAnti"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    } finally r.close()
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val r2 = graft.similarity.SemDedup.incrementalEmbeddingNearDuplicates(
      e.filter(col("vec_id") < 25L), e.filter(col("vec_id") >= 25L),
      "embedding", "vec_id", threshold = 0.3, numPlanes = 4, probeBits = 1)
    try {
      val p2 = plan(r2.survivors)
      assert(p2.contains("LeftAnti"), p2)
      assert(!p2.contains("CartesianProduct"), p2)
      assert(!p2.contains("BroadcastNestedLoopJoin"), p2)
    } finally r2.close()
  }

  test("q199: decontam census is ONE train-side explode, no cartesians") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull)
    val bg = graft.text.Decontaminate.gramSet(
      docs.filter(col("source") === "src19"), "text", 3)
    val p = plan(graft.text.Decontaminate.overlapCensus(
      docs.filter(col("source") =!= "src19"), "text", "doc_id", bg, 3))
    // one Generate for the train explode, one for the benchmark gram
    // set — a third would mean the census regressed to the two-branch
    // shape that scanned the train corpus twice. Formatted explain
    // prints each node once in the tree and once as a detail header
    // "(N) Generate"; count the headers.
    val generates = "\\(\\d+\\) Generate".r.findAllIn(p).length
    assert(generates === 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q197 probe join: AQE skew-split spreads a degenerate hot band key") {
    // The batch×history band-key probe join in Dedup
    // .incrementalNearDuplicates (and SemDedup's cell twin) is UNCAPPED
    // by correctness — a capped history probe would resurrect dupes —
    // so one band key carried by 10⁴ history docs is its worst case.
    // This pins the runtime escape hatch: with the batch side too big
    // to broadcast the join shuffles both sides on (band, key), the hot
    // key lands in one reducer partition, and AQE's skew split divides
    // it. Thresholds are lowered to make the optimizer fire at test
    // bytes; at production partition sizes the defaults (256 MB / 5×
    // median) fire on exactly this shape. Sub-threshold pathologies
    // have the explicit lever: graft.operators.Skew.saltedJoin on the
    // same keys (asserted pair-complete below).
    import org.apache.spark.sql.functions._
    val n = 40000L
    // the exact probe shape from Dedup.scala (keysH ⋈ keysB on
    // band+key); keys are DATA-DEPENDENT so constant folding cannot
    // degenerate the equi-join — 99% of history rows share the hot key
    def hotKey(id: org.apache.spark.sql.Column) =
      when(pmod(id, lit(100L)) < 99L, lit("HOT#KEY"))
        .otherwise(concat(lit("cold#"), id.cast("string")))
    def keysH(s: org.apache.spark.sql.SparkSession) = s.range(n)
      .select(col("id").as("id_a"), pmod(col("id"), lit(1L)).cast("int")
        .as("band"), hotKey(col("id")).as("key"))
    def keysB(s: org.apache.spark.sql.SparkSession) = s.range(4)
      .select((col("id") + 1000000L).as("id_b"),
        pmod(col("id"), lit(1L)).cast("int").as("band"),
        when(col("id") === 0L, lit("HOT#KEY"))
          .otherwise(concat(lit("b#"), col("id").cast("string"))).as("key"))
    val fork = spark.newSession()
    fork.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fork.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16kb")
    fork.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8kb")
    fork.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    val joined = keysH(fork).join(keysB(fork), Seq("band", "key"))
    // execute THIS frame's plan (a count() would plan separately) so
    // the adaptive plan finalizes with the runtime skew decision in it
    assert(joined.collect().length === (n / 100L * 99L).toInt)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.contains("skew=true"), p)
    // the explicit salt lever is pair-complete on the same shape
    val salted = graft.operators.Skew.saltedJoin(
      keysH(spark), keysB(spark), Seq("band", "key"), nSalts = 8)
    assert(salted.count() === n / 100L * 99L)
  }
}
