package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming micro-batch split collector for the bench harness,
  * registered by CLASS NAME via `spark.sql.streaming
  * .streamingQueryListeners` so EVERY session on the context — the
  * main bench session and each [[graft.operators.ConfScope]] fork the
  * streaming queries size their state stores with — attaches its own
  * instance at SessionState construction. A listener added with
  * `spark.streams.addListener` would see only the registering
  * session's queries (each StreamingQueryManager filters events to
  * its own runIds), which is exactly the round-10 regression hazard:
  * forked streaming queries silently dropping out of the recorded
  * split. Totals accumulate in the companion, shared across
  * instances.
  */
class BenchStreamMetrics extends StreamingQueryListener {
  import StreamingQueryListener._
  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    BenchStreamMetrics.batches.incrementAndGet()
    BenchStreamMetrics.rows.addAndGet(p.numInputRows)
    def d(k: String): Long =
      Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)
    BenchStreamMetrics.addBatchMs.addAndGet(d("addBatch"))
    BenchStreamMetrics.triggerMs.addAndGet(d("triggerExecution"))
    ()
  }
}

object BenchStreamMetrics {
  val batches = new java.util.concurrent.atomic.AtomicLong
  val rows = new java.util.concurrent.atomic.AtomicLong
  val addBatchMs = new java.util.concurrent.atomic.AtomicLong
  val triggerMs = new java.util.concurrent.atomic.AtomicLong
}
