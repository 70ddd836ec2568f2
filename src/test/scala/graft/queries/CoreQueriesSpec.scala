package graft.queries

import graft.SparkSpec

class CoreQueriesSpec extends SparkSpec {
  test("q1 pricing summary has the 6 flag/status groups and sane totals") {
    val rows = CoreQueries.q1Pricing(spark, sf).collect()
    rows.length should be >= 4
    val total = rows.map(_.getAs[Long]("count_order")).sum
    total should be > 0L
    // every group's avg_qty within the generator's 1..50 range
    all(rows.map(_.getAs[Double]("avg_qty"))) should (be >= 1.0 and be <= 50.0)
  }
}
