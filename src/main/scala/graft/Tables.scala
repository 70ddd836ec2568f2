package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver-generated parquet star schema.
  *
  * The reference walks a directory tree and reads files ad hoc
  * (`utils/io_helpers.py:5-79`); our engine's equivalent "scan layer" is
  * Spark's parquet source, which gives predicate pushdown, column pruning
  * and partition-sized splits for free. At 100 TB the same call reads a
  * partitioned table directory; nothing here assumes single-file layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from an sf directory (file or partitioned dir). */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
