package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry point: runs every registered query on
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds.
  * A warm-up pass on a trivial plan first amortizes JVM/codegen
  * infrastructure so timings measure the queries, not the first query's
  * JIT; queries then run in name order (deterministic timing layout).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // scratch on tmpfs: streaming checkpoints fsync per micro-batch and
    // spills share the device — route them off the (contended) root disk
    // so timings measure the engine, not the host's IO queue
    val scratch = graft.tools.Scratch.route("graft-bench-")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    scratch.foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: schema read + one small shuffle + codegen paths
    try {
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy("n_regionkey").count().count()
    } catch { case _: Throwable => () }

    // Per-query task-metric split (executor CPU vs run vs GC time):
    // wall-clock alone cannot distinguish "the code got slower" from
    // "the host was busy" — the round-5/6 q47/q57/q58 ambiguity. With
    // cpu ≈ prior rounds but wall inflated, the delta is scheduler/IO
    // wait (host contention); cpu inflated too means a real
    // regression. Flushed via the listener bus before each reading.
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            cpuNs.addAndGet(m.executorCpuTime)
            runMs.addAndGet(m.executorRunTime)
            gcMs.addAndGet(m.jvmGCTime)
            ()
          }
        }
      })
    // Streaming micro-batch split (per-batch machinery vs per-row data
    // work): the streaming tail's cost has been ASSERTED to be fixed
    // per-batch overhead (checkpoint commits, offset WAL, planning) in
    // two round reviews without a recorded number. Each progress event
    // carries the split directly: addBatch is the data work, the rest
    // of triggerExecution is the fixed machinery — so the JSON records,
    // per streaming query, batches / input rows / addBatch seconds /
    // fixed seconds. A fixed term that grows with sf would falsify the
    // assertion from the BENCH file alone.
    val sBatches = new java.util.concurrent.atomic.AtomicLong
    val sRows = new java.util.concurrent.atomic.AtomicLong
    val sAddBatchMs = new java.util.concurrent.atomic.AtomicLong
    val sTriggerMs = new java.util.concurrent.atomic.AtomicLong
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          sBatches.incrementAndGet()
          sRows.addAndGet(p.numInputRows)
          def d(k: String): Long =
            Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)
          sAddBatchMs.addAndGet(d("addBatch"))
          sTriggerMs.addAndGet(d("triggerExecution"))
          ()
        }
      })
    def metricSnapshot(): (Double, Double, Double, Long, Long, Double, Double) = {
      if (!org.apache.spark.GraftCoreBridge.flushListenerBus(spark.sparkContext))
        // a short flush bleeds this query's task metrics into the next
        // delta — say so rather than silently misattributing
        System.err.println("BENCH WARNING: listener bus flush timed out; " +
          "the adjacent cpu/gc deltas are unreliable")
      (cpuNs.get / 1e9, runMs.get / 1e3, gcMs.get / 1e3,
        sBatches.get, sRows.get, sAddBatchMs.get / 1e3, sTriggerMs.get / 1e3)
    }

    // Each query runs THREE times and records the min: the bench host
    // shows intermittent external contention (round-3's recording was
    // inflated up to 17× by it), and a query's first executions also pay
    // JIT compilation of its generated code — measured convergence takes
    // 2-3 executions for the sketch-heavy censuses (QLoop: q32 ran
    // 9.2/7.8/1.7/1.8 s in one JVM). Min-of-3 measures the code, not
    // the JIT or the neighbor; all raw runs are emitted for
    // transparency.
    final case class Run(wall: Double, cpu: Double, taskRun: Double,
      gc: Double, failure: Option[String],
      batches: Long = 0L, rows: Long = 0L,
      addBatchSec: Double = 0.0, fixedSec: Double = 0.0)
    // dev-only filter (SPARK_GRAFT_BENCH_ONLY=substr,substr): iterate on
    // a few queries without paying the full catalog; the driver sets no
    // filter and always runs everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(f => f.exists(n.contains)) }
    val results = selected.map { case (name, fn) =>
      def once(): Run = {
        // isolate cache state per run: earlier queries' persisted frames
        // otherwise squeeze the heap and turn later timings into
        // eviction noise; the explanation memo resets so a repeated q25
        // re-runs the full explainer
        spark.catalog.clearCache()
        if (name == "q25_certa_saliency")
          graft.queries.ErQueries.resetExplanationMemo()
        val (cpu0, run0, gc0, b0, rw0, ab0, tr0) = metricSnapshot()
        val t0 = System.nanoTime()
        // a crashing query must NOT look like a fast passing one: record
        // the failure and surface it in the JSON + on stderr
        val failure = try { fn(spark, sfDir).count(); None } catch {
          case t: Throwable =>
            System.err.println(s"BENCH FAILURE $name: ${t.getClass.getName}: ${t.getMessage}")
            Some(name)
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val (cpu1, run1, gc1, b1, rw1, ab1, tr1) = metricSnapshot()
        Run(wall, cpu1 - cpu0, run1 - run0, gc1 - gc0, failure,
          b1 - b0, rw1 - rw0, ab1 - ab0, (tr1 - tr0) - (ab1 - ab0))
      }
      val runs = Seq(once(), once(), once())
      val best = runs.minBy(_.wall)
      (name, best, runs, runs.flatMap(_.failure).headOption)
    }
    def obj(f: ((String, Run, Seq[Run], Option[String])) => Double): String =
      results.map(r => "\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val qs = obj(_._2.wall)
    // task-metric split of the SAME run the headline number comes from
    val cpu = obj(_._2.cpu)
    val taskRun = obj(_._2.taskRun)
    val gc = obj(_._2.gc)
    val runs = (0 until 3).map(i => obj(_._3(i).wall)).mkString("[", ",", "]")
    val failures = results.flatMap(_._4).map("\"" + _ + "\"").mkString("[", ",", "]")
    // streaming split, only for queries that actually ran micro-batches
    // (same best run the headline number comes from)
    val streaming = results.filter(_._2.batches > 0).map { r =>
      "\"" + r._1 + "\":{\"batches\":" + r._2.batches +
        ",\"rows\":" + r._2.rows +
        ",\"addbatch_sec\":" + r._2.addBatchSec +
        ",\"fixed_sec\":" + r._2.fixedSec + "}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2.wall).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cpu_sec":$cpu,"task_run_sec":$taskRun,"gc_sec":$gc,"streaming":$streaming,"runs":$runs,"failures":$failures,"sf":"$sfDir"}""")
    spark.stop()
  }
}
