package org.apache.spark

/** Bridge into SparkContext's private[spark] listener bus so the benchmark
  * can settle asynchronous task-metric events before snapshotting (the
  * scaling-forensics counters would otherwise race the event queue).
  */
object GraftSparkBridge {
  def waitListeners(sc: SparkContext, timeoutMs: Long = 30000): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
