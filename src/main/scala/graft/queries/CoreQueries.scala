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
        // decimal sums: exact, summation-order independent (the ADVICE
        // r01 hash-drift class); one double division for the means
        round(sum(col("l_quantity").cast("decimal(18,4)")), 2)
          .cast("double").as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(18,4)")), 2)
          .cast("double").as("sum_base_price"),
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")), 2).cast("double").as("sum_disc_price"),
        round(sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          / count(lit(1)), 4).as("avg_qty"),
        round(sum(col("l_discount").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
      |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-31'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
