package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` surface: listener delivery is
  * async, and a fixed sleep both slows the suite and can under-wait on
  * a loaded machine — draining the bus is deterministic. */
object TestBridge {
  def drainListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
