package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Summary aggregations — A3 (per-file summary), A5 (mean/count), A6
  * (min/max/mean/half-peak-to-peak section stats).
  */
object Summaries {

  /** A3 — the per-file summary shape of `utils/exporters.py:34-52`
    * (written twice there, pandas and polars; once here).
    */
  def perKeySummary(df: DataFrame, keyCol: String,
                    wordsCol: String, charsCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(max(col(charsCol)).as("max_chars"),
           sum(col(wordsCol)).as("total_words"),
           sum(col(charsCol)).as("total_chars"),
           count(lit(1)).as("n_records"))

  /** A6 — per-section load stats: MEAN / MAXIMUM / MINIMUM / half
    * peak-to-peak, the `process_blade_load.py:143-213` regrouping. One
    * shuffle; (max-min)/2 computed post-agg so each input row is read
    * once.
    */
  def sectionStats(df: DataFrame, keys: Seq[String],
                   valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      // mean via exact decimal sum + one double division: partition
      // summation order cannot move the rounded value
      .agg(round(sum(col(valueCol).cast("decimal(18,6)")).cast("double")
             / count(lit(1)), 4).as("mean"),
           round(max(col(valueCol)), 4).as("maximum"),
           round(min(col(valueCol)), 4).as("minimum"))
      .withColumn("half_p2p",
        round((col("maximum") - col("minimum")) / 2.0, 4))
}
