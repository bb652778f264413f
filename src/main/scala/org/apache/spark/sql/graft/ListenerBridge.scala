package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener bus drain — the only way to
  * make listener-derived accounting (the Bench global-window census)
  * attributable per query: `QueryExecutionListener` events are
  * delivered asynchronously on the shared bus, so without a drain an
  * event from query N lands while query N+1 is already running and the
  * census charges the wrong site (observed: t22's whitelisted window
  * attributed to t23). `waitUntilEmpty` blocks until every queued
  * event has been dispatched.
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
