package org.apache.spark

/** Bridge into `private[spark]` scheduler internals the bench harness
  * needs: flushing the async listener bus so per-query task-metric
  * accumulation is complete before a timing is recorded.
  */
object GraftCoreBridge {
  /** Block until every queued listener event has been delivered.
    * Returns false — and the caller should flag its reading — when the
    * bus still has a backlog after the timeout: a short flush means
    * task metrics bleed into the NEXT interval's delta, which is
    * exactly the misattribution the bench split exists to prevent.
    */
  def flushListenerBus(sc: SparkContext): Boolean =
    try { sc.listenerBus.waitUntilEmpty(10000L); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
