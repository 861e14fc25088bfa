package org.apache.spark

/** Test-only bridge to `private[spark]` internals: deterministic
  * listener-event synchronization (the alternative — sleeping and
  * hoping the async bus has drained — is flaky under CI load). */
object GraftSparkAccess {
  /** Block until every event posted so far has been delivered to all
    * registered listeners, or fail after `timeoutMs`. */
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
