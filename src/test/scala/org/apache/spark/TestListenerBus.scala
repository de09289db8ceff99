package org.apache.spark

/** Test bridge into the private[spark] listener bus: QueryExecutionListener
  * events are delivered asynchronously via the LiveListenerBus, so specs
  * that capture executed plans must drain the bus before asserting. */
object TestListenerBus {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
