package org.apache.spark

/** Bridge into spark-core's private listener bus: lets measurement
  * helpers flush pending listener events deterministically instead of
  * sleeping. */
object GraftListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
