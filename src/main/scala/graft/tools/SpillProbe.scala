package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Dev tool behind the BASELINE.md "spill sensitivity" follow-up
  * (round-10 ask): the q47/q30 candidate-pair self-join was the one
  * stage in the ~100× trend runs that swung 79.8 → 232 s under disk
  * contention at 8 M docs. This probes the proposed mitigation —
  * raising `spark.sql.shuffle.partitions` at the big point so
  * per-task shuffle state fits in memory — by timing the LSH
  * pair stage at several partition settings and recording the
  * ACTUAL spill (memory + disk bytes from task metrics), which is
  * the quantity disk contention multiplies.
  *
  * Usage: `SpillProbe [docsN] [parts,parts,...]` (defaults
  * 8000000 and 32,128,512). Each setting runs the shape twice on a
  * warm JVM and reports the second, ScaleTrend's convention.
  */
object SpillProbe {

  def main(args: Array[String]): Unit = {
    val docsN = args.headOption.map(_.toLong).getOrElse(8000000L)
    val partSettings = args.drop(1).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(32, 128, 512))
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", out + "/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // spill accounting: task-metric bytes summed across every task
    // since the JVM started; snapshot deltas bracket each timed run
    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    // ScaleTrend owns the corpus generator AND the cache-path scheme —
    // sharing both means this probe can never measure a fixture that a
    // different generator version wrote
    val docs = spark.read.parquet(ScaleTrend.docsFixture(spark, docsN, out))

    def pairStage(): Long =
      graft.ext.Dedup.lshNearDupPairs(docs, "text", "doc_id",
        shingleWidth = 1, numHashes = 24, numBands = 3, threshold = 0.9,
        maxBucketSize = 200).count() // ScaleTrend's cap: apples-to-apples

    println(f"${"parts"}%6s ${"run"}%4s ${"sec"}%8s ${"memSpill"}%12s ${"diskSpill"}%12s ${"shufWrite"}%12s   rows")
    partSettings.foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      (1 to 2).foreach { i =>
        val (m0, d0, w0) = (memSpill.get, diskSpill.get, shufWrite.get)
        val t0 = System.nanoTime()
        val rows = pairStage()
        val sec = (System.nanoTime() - t0) / 1e9
        // deterministic drain: task-end events lag job completion on a
        // loaded host, so a fixed sleep could attribute spill bytes to
        // the wrong run — wait until the bus is actually empty
        org.apache.spark.sql.graftbridge.Bridge
          .waitListenerBusEmpty(spark.sparkContext)
        def gb(x: Long) = f"${x / 1e9}%.2f GB"
        println(f"$p%6d $i%4d $sec%8.1f ${gb(memSpill.get - m0)}%12s " +
          f"${gb(diskSpill.get - d0)}%12s ${gb(shufWrite.get - w0)}%12s   $rows")
      }
    }
    spark.stop()
  }
}
