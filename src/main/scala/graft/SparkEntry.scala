package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` holds DuckDB-runnable ANSI SQL with IDENTICAL output column
  * names (driver sorts columns by name before hashing values). Queries
  * with no SQL-expressible oracle are present in `queries` only (rows>0
  * check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1Pricing(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (CoreQueries.q1Pricing _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> CoreQueries.q1PricingSql
  )
}
