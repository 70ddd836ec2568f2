package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._

/** Builds a DataFrame from a custom LogicalPlan. `classic.Dataset.ofRows`
  * is private[sql], so this one file lives under org.apache.spark.sql —
  * the standard extension-library technique; nothing else reaches into
  * Spark internals.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(castToImpl(spark), plan)

  /** Block until the listener bus has delivered every queued event —
    * `SparkContext.listenerBus` / `LiveListenerBus.waitUntilEmpty()`
    * are private[spark], hence surfaced here. Lets measurement tools
    * bracket task-metric accounting deterministically instead of
    * sleeping and hoping the bus drained (the drain is unbounded only
    * if a listener livelocks, which is already a bug).
    */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
