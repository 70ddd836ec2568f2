package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: the measured trajectory behind `LshSkew.CensusTrend` —
  * what the per-batch cap census of the SRP streaming fold-in looks
  * like under a CONCENTRATING arriving distribution vs an
  * in-distribution control, and where the sustained-growth signal
  * fires. Feeds BASELINE.md §"SRP census trend" and the SURVEY §9
  * runbook rule ("sustained census growth ⇒ re-band or raise the
  * cap").
  *
  * Why this is SRP's drift dial: IVF recall decays under drift
  * because its centroids freeze; SRP planes are data-independent, so
  * bucketing quality never decays — but a drifting distribution that
  * CONCENTRATES piles arriving vectors into fewer sign buckets,
  * union totals climb, and once a bucket crosses the cap its pairs
  * silently stop being emitted (recall loss on exactly the drifted
  * mass). The census is returned per batch either way; the question
  * the probe answers is what the TREND looks like in each regime so
  * the runbook can distinguish "one degenerate batch" from "re-band
  * now".
  *
  * Protocol: corpus = UNIFORM random vectors (hash-derived, 64 dims
  * — deliberately NOT the clustered scale fixture: clustered
  * geometry is sign-degenerate by construction, every cluster IS a
  * capped bucket, so it cannot show a healthy control). SRP index
  * with the scale rows' banding (4 bands × 8 planes → 256 sign
  * patterns per band); the cap encodes healthy headroom: ×1.2 the
  * built corpus's largest bucket (tight enough that one concentrated
  * batch's own mass crosses it — a looser cap only delays the same
  * trajectory while letting the pre-crossing batch pair quadratically). Two runs of `batches` fold-ins of
  * `batchSize` vectors through incrementalPairs + append (the
  * streaming body's exact pair/fold sequence), both feeding a
  * [[graft.ext.LshSkew.CensusTrend]]:
  *
  *  - CONTROL: batches from the corpus generator (fresh ids) —
  *    bucket totals grow proportionally (~batch/corpus per batch),
  *    the ×1.2 headroom absorbs it, zero drops expected;
  *  - DRIFTED: batches concentrate around ONE direction (tight
  *    noise) — each fold-in piles the whole batch into one sign
  *    bucket per band, the cap is crossed immediately, and
  *    droppedRows grows monotonically with the folded-in mass —
  *    `sustainedDrops(3)` is the fire condition.
  *
  * Usage: `CensusTrendProbe [n] [batches] [batchSize]` — defaults
  * 400000, 10, 7000.
  */
object CensusTrendProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(400000L)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val batchSize = args.drop(2).headOption.map(_.toLong).getOrElse(7000L)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", out + "/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dims = ScaleTrend.VecDims
    def u(seed: Column): Column =
      (pmod(xxhash64(seed), lit(100000L)).cast("double") / 100000.0) - 0.5

    /** Uniform vectors (the corpus/control generator). */
    def uniformVecs(from: Long, m: Long): DataFrame =
      spark.range(from, from + m)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(dims - 1)),
            d => u(col("id") * dims + d).cast("float")).as("embedding"))

    /** Concentrated vectors: one fixed direction + tight noise — the
      * drifted arrivals whose sign patterns collapse into one bucket
      * per band.
      */
    def driftedVecs(from: Long, m: Long): DataFrame =
      spark.range(from, from + m)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(dims - 1)), d => (
            u(lit(424242L) * dims + d)
              + u(col("id") * dims + d + 7777777L) * 0.005
            ).cast("float")).as("embedding"))

    val (bands, planes) = (4, 8) // the ScaleTrend srp shape params

    def run(label: String, gen: (Long, Long) => DataFrame): Unit = {
      val idxPath = s"$out/censusidx_${label}_${n}_b$batchSize"
      val fs = new org.apache.hadoop.fs.Path(idxPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(idxPath), true)
      graft.ext.SrpIndex.build(spark, idxPath, uniformVecs(0, n),
        "vec_id", "embedding", bands, planes, dims)
      // the cap encodes healthy headroom over the BUILT corpus: ×1.2
      // the largest sign bucket (re-derived per run from the stored
      // counts — one tiny aggregate)
      val maxBucket = spark.read.parquet(s"$idxPath/buckets.parquet")
        .agg(max(col("bucket_n"))).head().getLong(0)
      val cap = (maxBucket * 6 / 5).toInt
      println(s"$label: corpus=$n maxBucket=$maxBucket cap=$cap " +
        s"batches=$batches x $batchSize")
      val trend = new graft.ext.LshSkew.CensusTrend()
      (0 until batches).foreach { k =>
        val b = gen(n + k * batchSize, batchSize)
        // the streaming body's sequence: pair against the current
        // index view, then fold the batch in
        val index = graft.ext.SrpIndex.load(spark, idxPath)
        val (pairs, census) = graft.ext.SrpIndex.incrementalPairs(
          index, b, threshold = 0.9, maxBucketSize = cap)
        val nPairs = pairs.count()
        trend.record(census, k.toLong)
        graft.ext.SrpIndex.append(spark, idxPath, b,
          batchMarker = Some(k.toLong))
        println(f"  batch $k%2d: droppedBuckets=${census.droppedBuckets}%3d " +
          f"droppedRows=${census.droppedRows}%8d pairs=$nPairs%6d " +
          s"sustained3=${trend.sustainedDrops(3)}")
      }
      val (seen, dropped) = trend.totals
      println(s"$label: batches=$seen droppedBatches=$dropped " +
        s"sustained3=${trend.sustainedDrops(3)}")
      fs.delete(new org.apache.hadoop.fs.Path(idxPath), true)
    }

    run("control", uniformVecs)
    run("drifted", driftedVecs)
    spark.stop()
  }
}
