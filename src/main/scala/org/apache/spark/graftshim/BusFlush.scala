package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Exact listener-bus flush for graft's cap tripwire.
  *
  * `QueryExecutionListener` events post asynchronously on the shared
  * listener bus, and the public API offers no way to await delivery —
  * a fixed settle sleep leaves a race where a loaded bus delivers a
  * query's cap event after its drain, mis-attributing it to the next
  * query (or letting a capped dump through the oracle gate).
  * `LiveListenerBus.waitUntilEmpty` is exactly that await, but it is
  * `private[spark]`; this one-liner lives in an `org.apache.spark`
  * subpackage to reach it. */
object BusFlush {

  /** Block until every queued listener event has been delivered (or
    * the bus's own internal timeout trips — propagated to the caller,
    * who falls back to a settle sleep). */
  def waitEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
