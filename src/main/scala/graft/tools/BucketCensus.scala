package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Band-bucket size census of the LSH stage at corpus scale — the
  * executable answer to "what does the finite default cap actually
  * drop on a big corpus?" (the round-10/11 cap discussion). Uses the
  * SAME banded frame as the production pair path — by construction,
  * via `Dedup.bandedFrame` (probe parameters shingleWidth=1,
  * numHashes=24, numBands=3) — and aggregates the bucket-size
  * DISTRIBUTION: one cheap groupBy, the candidate-pair self-join is
  * never constructed, so this is safe to run uncapped at any corpus
  * size where the pair stage itself would fill the disk.
  *
  * For each probe cap it prints the dropped-bucket/row counts the
  * [[graft.ext.LshSkew.CapCensus]] of a real run would report, plus
  * the candidate volume the capped run actually generates:
  * sum(size² over size ≤ cap) — the cap DROPS over-cap buckets
  * entirely (left-anti join, zero pairs from them); it does not clamp
  * them to their first cap members.
  *
  * Usage: `BucketCensus [docsN] [cap,...] [numHashes] [numBands]`
  * (defaults 8000000; caps 200,1000,100000 — the probe setting, a mid
  * point, and the `LshSkew.DefaultMaxBucketSize`; banding 24/3, the
  * shipped q30/q47 setting). Passing a different `numBands` censuses
  * the banding-parameter trade the round-11 conclusion names as the
  * volume lever: more bands of fewer rows → smaller band keys → more
  * candidate volume and higher recall; fewer, wider bands → the
  * reverse. SPARK_GRAFT_SCALE_DIR picks the fixture root
  * (ScaleTrend's generator + cache scheme, so the corpus is
  * byte-identical to the SpillProbe/ScaleTrend measurements).
  */
object BucketCensus {
  def main(args: Array[String]): Unit = {
    val docsN = args.headOption.map(_.toLong).getOrElse(8000000L)
    val caps = args.drop(1).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(200, 1000, 100000))
    val numHashes = args.drop(2).headOption.map(_.toInt).getOrElse(24)
    val numBands = args.drop(3).headOption.map(_.toInt).getOrElse(3)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", out + "/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Dedup

    val docs = spark.read.parquet(ScaleTrend.docsFixture(spark, docsN, out))
    val (base, banded) = Dedup.bandedFrame(docs, "text", "doc_id",
      shingleWidth = 1, numHashes = numHashes, numBands = numBands)
    val sizes = banded.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("sz"))
      .select(col("sz"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dist = sizes.agg(
        count(lit(1)).as("buckets"),
        sum(col("sz")).as("rows"),
        max(col("sz")).as("max_sz"),
        expr("percentile_approx(sz, array(0.5, 0.99, 0.999), 10000)").as("p"))
        .head()
      println(s"docs=$docsN numHashes=$numHashes numBands=$numBands " +
        s"buckets=${dist.getLong(0)} rows=${dist.getLong(1)} " +
        s"maxBucket=${dist.getLong(2)} p50/p99/p999=${dist.getSeq[Long](3).mkString("/")}")
      caps.foreach { cap =>
        val r = sizes.agg(
          sum(when(col("sz") > cap, 1).otherwise(0)).as("dropped_buckets"),
          sum(when(col("sz") > cap, col("sz")).otherwise(0)).as("dropped_rows"),
          sum(when(col("sz") <= cap, col("sz") * col("sz")).otherwise(0))
            .as("pair_volume"))
          .head()
        println(f"cap=$cap%7d droppedBuckets=${r.getLong(0)}%6d " +
          f"droppedRows=${r.getLong(1)}%10d pairVolume=${r.getLong(2)}%14d")
      }
    } finally {
      sizes.unpersist()
      banded.unpersist()
      base.unpersist()
    }
    spark.stop()
  }
}
