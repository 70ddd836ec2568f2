package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `sql` package: `ExpressionUtils.column` is
  * `private[sql]` in Spark 4, but wrapping a raw Catalyst `Expression`
  * as a user-facing `Column` is exactly how native expressions (e.g.
  * `graft.functions.GramStats`) are exposed without a per-session
  * function-registry round-trip.
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
