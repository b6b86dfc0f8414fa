package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Core-scope bridge (bench instrumentation only). The task-metrics
  * listener bus is asynchronous, so per-query byte counters read right
  * after an action may miss the tail of the query's own events;
  * `waitUntilEmpty` is `private[spark]`, hence this one-file package
  * bridge — the core-side sibling of `org.apache.spark.sql.graft
  * .ColumnBridge`, and like it the only core-private access in the repo.
  */
object CoreBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
