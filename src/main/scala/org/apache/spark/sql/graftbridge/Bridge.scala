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
}
