package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Batch sinks — SURVEY.md §2.9 K1–K4: csv (header, utf-8), json,
  * parquet (the idiomatic replacement for the reference's pickle
  * export, `process_blade_load.py:62-65`). Partition-parallel writes;
  * `coalesce(1)` only when a caller genuinely wants one file.
  */
object Exporters {

  def csv(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  def json(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** ORC — the other columnar interchange format a lakehouse speaks
    * (Hive/Trino ecosystems): same footer-stats pushdown family as
    * parquet, full nested/array type support, so typed frames
    * round-trip losslessly (oracle-gated by q126 including an
    * array<float> column).
    */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Partitioned parquet: the record-store's tag dict as partition
    * columns (SURVEY.md §1.1) — a tag selector on the read side becomes
    * a partition-pruning filter, so queries touching one tag value
    * never open the other directories.
    */
  def partitionedParquet(df: DataFrame, path: String,
                         partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Parquet cache keyed by a stable content key — the reference's
    * sha1-keyed cache (`plotting_impl.py:93-147`): compute once, reload
    * thereafter.
    */
  def cached(spark: SparkSession, cacheDir: String, key: String)
            (build: => DataFrame): DataFrame = {
    val path = s"$cacheDir/$key.parquet"
    val fs = FileOps.fileSystem(path, spark)
    if (fs.exists(new org.apache.hadoop.fs.Path(path))) spark.read.parquet(path)
    else {
      val df = build
      df.write.mode(SaveMode.Overwrite).parquet(path)
      spark.read.parquet(path)
    }
  }
}
