package org.apache.spark

/** Visibility bridge (the `GraftColumnBridge` discipline: a one-line
  * forwarder for a `private[spark]` member, no behavior of its own).
  *
  * `graft.Bench`'s per-query task-metrics attribution (spill / GC /
  * peak-execution-memory maps on the detail line) snapshots cumulative
  * listener counters between serially-measured queries — but task-end
  * events are delivered on the async listener bus, so without a drain a
  * query's last tasks would be credited to its successor.
  * `LiveListenerBus.waitUntilEmpty` is `private[spark]`; this forwarder
  * is the only crossing.
  */
object GraftListenerBridge {

  /** Block until every event posted so far is delivered (bounded: a
    * stuck bus degrades attribution, it must not hang the bench).
    */
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
