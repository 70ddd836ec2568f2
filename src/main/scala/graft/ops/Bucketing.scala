package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located joins via bucketing — the scale lever for repeated
  * fact-fact joins (SURVEY.md "Partitioning & shuffle"): writing both
  * sides bucketed (and sorted) on the join key lets Spark join them
  * with NO shuffle exchange — at 100 TB that turns the dominant
  * repeated cost of a pipeline into a one-time layout cost.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `keys`. The
    * bucket count should match the downstream parallelism target
    * (one bucket ≈ one task); both join sides must agree on it.
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
                    keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys — planner emits a
    * SortMergeJoin with zero Exchange when bucket specs line up.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)
}
