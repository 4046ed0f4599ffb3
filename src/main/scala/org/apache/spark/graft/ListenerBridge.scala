package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; the bench needs to
  * drain it so per-query shuffle-metric snapshots (taken between
  * sequentially-run queries) don't race the async listener bus. Same
  * bridge pattern as `org.apache.spark.sql.graft.ColumnBridge`.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
