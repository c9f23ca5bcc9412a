package org.apache.spark

/** Bridge into `private[spark]` scheduler internals the bench harness
  * needs: flushing the async listener bus so per-query task-metric
  * accumulation is complete before a timing is recorded.
  */
object GraftCoreBridge {
  /** Block until every queued listener event has been delivered. */
  def flushListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
