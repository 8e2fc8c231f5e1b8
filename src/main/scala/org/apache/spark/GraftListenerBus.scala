package org.apache.spark

/** Package bridge (the `org.apache.spark.sql.GraftColumns` pattern —
  * standard technique for the handful of Spark APIs that are
  * `private[spark]` but load-bearing for tooling):
  * `LiveListenerBus.waitUntilEmpty` flushes the asynchronous listener
  * event queue. The bench needs it to drain task-end events before
  * reading its per-query shuffle-byte counters — without the flush a
  * query's last tasks could be attributed to the NEXT query. */
object GraftListenerBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
