package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` listener-bus internals: specs
  * that assert on task metrics must drain the async bus before reading
  * their accumulators.
  */
object ListenerSync {
  def await(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(30000)
}
