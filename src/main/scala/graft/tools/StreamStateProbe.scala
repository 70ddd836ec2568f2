package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev tool behind the SURVEY §9 runbook claim "RocksDB for keyspaces
  * beyond heap" — previously prescribed but UNMEASURED: the streaming
  * gates run at fixture scale (thousands of state rows), so the
  * on-heap-vs-RocksDB trade had gate-shaped evidence only.
  *
  * This measures the two streaming state shapes whose state grows with
  * the KEYSPACE (not the window count) at a ~9 M-key / 1 M-group
  * keyspace — the scaled-up analog of the q84/q99 gates
  * (`builtin_recorders.py:56-193` is the reference sink whose
  * streaming face these are):
  *
  *  - `dedup`: [[graft.streaming.EventStream.dedupEvents]] — state is
  *    one row per distinct event id inside the watermark horizon; the
  *    fixture packs every event into 50 min of a 1 h horizon, so NO
  *    eviction happens and peak state is the whole keyspace (the
  *    honest worst case the runbook warns about).
  *  - `kmv`: per-user distinct-value KMV sketches (update-mode agg on
  *    a 1 M-key non-windowed group — q99's sketch machinery keyed at
  *    corpus cardinality instead of per-day×type).
  *
  * Per (shape, provider) run: fresh checkpoint dir (state REBUILD is
  * what's timed), AvailableNow over the parquet backlog in bounded
  * micro-batches (`maxFilesPerTrigger`, so store commit churn is
  * exercised, not just one giant batch), noop sink. Reported: wall,
  * peak state rows, peak in-memory state bytes (the progress metric —
  * for RocksDB this is block-cache+memtable, NOT heap), and the
  * on-disk size of the checkpoint's state/ tree (the durable footprint
  * + for RocksDB the working set that does not live on heap).
  *
  * One PROVIDER per JVM invocation (the SpillProbe lesson: probe
  * variants sharing a JVM contaminate each other — here via the
  * state-store provider cache holding the previous run's maps).
  *
  * Usage: `StreamStateProbe [shapes] [provider] [eventsN]`
  * (defaults `dedup,kmv`, `heap`, 10000000). The events fixture is
  * cached under SPARK_GRAFT_SCALE_DIR with the ScaleTrend
  * version-token discipline.
  */
object StreamStateProbe {

  /** Bump on any [[synthEvents]] change ([[ScaleTrend.GenVersion]]
    * discipline — the path must encode which generator wrote it).
    */
  private[tools] val EvGenVersion = "e1"

  /** Deterministic event stream: ~10% of rows duplicate the previous
    * event id (so dedup has real work and the distinct keyspace is
    * ~0.9 N); every ts lands inside 50 min, WELL within the 1 h
    * dedup/watermark horizon, so no state evicts before end-of-stream;
    * user_id folds to a 1 M-key space for the per-user sketch shape.
    */
  private def synthEvents(spark: SparkSession, n: Long) =
    spark.range(n).select(
      when(pmod(col("id"), lit(10L)) === 0 && col("id") > 0, col("id") - 1)
        .otherwise(col("id")).as("event_id"),
      (lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime / 1000)
        + pmod(col("id") * 2654435761L, lit(3000L)))
        .cast("timestamp").as("ts"),
      pmod(col("id"), lit(1000000L)).as("user_id"),
      concat(lit("t"), pmod(col("id"), lit(4L))).as("event_type"),
      (pmod(xxhash64(col("id")), lit(1000L)).cast("double") / 10.0).as("value"))

  private[tools] def eventsFixture(spark: SparkSession, n: Long,
                                   out: String): String = {
    val path = s"$out/events_${n}_$EvGenVersion"
    if (!new java.io.File(path + "/_SUCCESS").exists())
      synthEvents(spark, n).repartition(64)
        .write.mode("overwrite").parquet(path)
    path
  }

  private def dirBytes(root: java.io.File): Long =
    if (!root.exists()) 0L
    else if (root.isFile) root.length()
    else root.listFiles() match {
      case null => 0L
      case fs   => fs.map(dirBytes).sum
    }

  def main(args: Array[String]): Unit = {
    val shapes = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("dedup", "kmv"))
    val provider = args.drop(1).headOption.getOrElse("heap")
    // the provider string is transcribed into BASELINE tables — a typo
    // must not silently run heap under a rocksdb label
    require(Set("heap", "rocksdb")(provider),
      s"provider must be 'heap' or 'rocksdb', got '$provider'")
    val eventsN = args.drop(2).headOption.map(_.toLong).getOrElse(10000000L)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", out + "/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fixture = eventsFixture(spark, eventsN, out)

    // the gates' production partition count (8, StreamProbe r11): state
    // fan-out is part of what the providers price, so both use it
    val parts = 8

    def readFixture() = {
      val schema = spark.read.parquet(fixture).schema
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16) // 64 files -> 4 micro-batches
        .parquet(fixture)
    }

    def dedupShape() =
      graft.streaming.EventStream.dedupEvents(readFixture(), "event_id", "1 hour")

    def kmvShape() = {
      val kmvU = udaf(graft.ext.Sketches.kmv[Long](16)(identity),
        org.apache.spark.sql.Encoders.scalaLong)
      readFixture()
        .withColumn("h",
          graft.ext.Dedup.hexHash(col("event_id").cast("string"), "sk#"))
        .withWatermark("ts", "1 hour")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), kmvU(col("h")).as("est"))
    }

    def runOnce(shape: String, runIdx: Int): Unit = {
      val ckpt = s"$out/stream_ckpt_${shape}_${provider}_$runIdx"
      val ckptFile = new java.io.File(ckpt)
      def body(): Unit = graft.streaming.EventStream.withShufflePartitions(spark, parts) {
        org.apache.commons.io.FileUtils.deleteQuietly(ckptFile)
        val df = if (shape == "dedup") dedupShape() else kmvShape()
        val t0 = System.nanoTime()
        val q = df.writeStream
          .format("noop")
          .outputMode(if (shape == "dedup") "append" else "update")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        val states = q.recentProgress.flatMap(_.stateOperators)
        val peakRows = if (states.isEmpty) 0L else states.map(_.numRowsTotal).max
        val peakMem = if (states.isEmpty) 0L else states.map(_.memoryUsedBytes).max
        val diskGb = dirBytes(new java.io.File(ckpt, "state")) / 1e9
        println(f"$shape%-6s $provider%-8s run$runIdx $sec%8.1f s  " +
          f"rows=$peakRows%,12d  stateMem=${peakMem / 1e9}%6.2f GB  " +
          f"stateDisk=$diskGb%6.2f GB")
        org.apache.commons.io.FileUtils.deleteQuietly(ckptFile)
      }
      if (provider == "rocksdb")
        graft.streaming.EventStream.withRocksDbStateStore(spark)(body())
      else body()
    }

    println(f"${"shape"}%-6s ${"provider"}%-8s run  ${"sec"}%8s  (events=$eventsN, parts=$parts)")
    shapes.foreach { s => (1 to 2).foreach(i => runOnce(s, i)) }
    spark.stop()
  }
}
