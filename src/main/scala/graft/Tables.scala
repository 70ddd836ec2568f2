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

  /** Read one table from an sf directory (file or partitioned dir).
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark
    * rejects outright; we read it as a raw nanosecond long
    * (`nanosAsLong`) and rebuild a micros timestamp with integer
    * division — `div`, not `/`, because a ~1.7e18 nanos epoch exceeds
    * double precision (2^53) and float division would corrupt the value.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
