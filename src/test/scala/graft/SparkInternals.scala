package graft

import org.apache.spark.SparkContext

/** Test-harness facade over [[org.apache.spark.GraftListenerBusAccess]]. */
object SparkInternals {
  def drainListenerBus(sc: SparkContext): Unit =
    org.apache.spark.GraftListenerBusAccess.drain(sc)
}
