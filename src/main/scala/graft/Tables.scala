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
    * `events.ts` has been written two ways across generator versions:
    * parquet TIMESTAMP(NANOS) (which Spark rejects outright — read as a
    * raw nanosecond long via `nanosAsLong` and rebuilt with integer
    * division: `div`, not `/`, because a ~1.7e18 nanos epoch exceeds
    * double precision (2^53) and float division would corrupt the
    * value) and plain TIMESTAMP(MICROS) without a timezone annotation
    * (which Spark 4 infers as TIMESTAMP_NTZ). Branch on the type the
    * scan actually produced and normalize both to session-timezone
    * `timestamp` — the session is pinned UTC, so the NTZ→TZ cast is
    * value-preserving and downstream windows/oracles see one type.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      import org.apache.spark.sql.functions._
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampType => raw
        case org.apache.spark.sql.types.TimestampNTZType =>
          // value-preserving under the UTC-pinned session
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case other =>
          // fail NAMING the layout: a silent cast of a third generator
          // drift (int32 epoch-seconds, strings) would produce
          // plausible-but-wrong values and surface only as an opaque
          // oracle-hash mismatch far downstream
          throw new IllegalArgumentException(
            s"events.ts has unsupported physical type $other — known " +
              "layouts are nanos-as-long and TIMESTAMP(_NTZ) micros")
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
