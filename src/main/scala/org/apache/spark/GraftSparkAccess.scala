package org.apache.spark

/** Bridge to `private[spark]` surface the bench harness needs: the
  * listener bus must drain before reading per-query shuffle counters,
  * or the last stages' task-end events land in the NEXT query's delta.
  */
object GraftSparkAccess {
  def flushListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
