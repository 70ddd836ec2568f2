package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational-core queries (SURVEY.md §2.2–§2.8) with DuckDB oracles.
  *
  * Conventions shared with the oracle SQL (driver hash-compares after
  * sorting columns by name):
  *  - every computed column is aliased identically on both sides;
  *  - double aggregates are `round`ed (2dp for sums, 4dp for ratios) so
  *    summation order across 32 partitions cannot flip the hash;
  *  - result sets are small (grouped or limited) — never raw fact rows.
  */
object CoreQueries {

  /** A3 / TPC-H Q1 analog — the flagship pricing summary.
    * Mirrors the per-file summary aggregation shape of the reference
    * (`utils/exporters.py:34-52`) at star-schema scale: partial aggregation
    * map-side, one shuffle on the two low-cardinality group keys.
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-31'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
