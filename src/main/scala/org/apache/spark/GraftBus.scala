package org.apache.spark

/** Minimal shim into the `private[spark]` listener bus: the bench's
  * slow-run stage tracer ([[graft.StageTracer]]) snapshots stage metrics
  * right after a query's timed region, but listener events are delivered
  * asynchronously — without a drain the snapshot races the bus and the
  * last stages of the traced query are silently missing. Public Spark
  * API offers no drain, hence this one-method package-private accessor.
  * Untimed (called only after the timed region closes). */
object GraftBus {
  /** Block until all queued listener events are delivered, or timeout. */
  def drain(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
