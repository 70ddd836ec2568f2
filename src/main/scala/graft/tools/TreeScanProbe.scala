package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: `TreeScan` at FILE-COUNT scale — the S1 claim
  * ("scanDistributed is the tens-of-millions-of-files shape") is
  * plan-asserted (metadata-only ReadSchema, TreeScanSpec) but was
  * never measured beyond gate scale. This probe builds a synthetic
  * 1 M-file tree once (cached under SPARK_GRAFT_SCALE_DIR like every
  * scale fixture) and measures, for BOTH listing paths:
  *
  *  - wall-clock of a full inventory (count + size sum — forces the
  *    complete listing, no content read);
  *  - driver heap retained across the scan (used-heap after System.gc
  *    before/after — approximate by nature, but the driver-side walk
  *    materializes one Seq row per file on the driver while the
  *    distributed path keeps rows on executors, and that difference
  *    is exactly what the number shows);
  *  - for the distributed path, the executor fan-out (tasks in the
  *    inventory job, read from the listener).
  *
  * Tree shape: `dirs × dirs` directories with `files` 1-byte files
  * each — 100×100×100 = 1 M files over 10 k leaf dirs, deep enough
  * that parallel partition discovery (threshold 32 dirs) actually
  * distributes the listing.
  *
  * Usage: `TreeScanProbe [dirs] [files]` — defaults 100, 100.
  */
object TreeScanProbe {

  def main(args: Array[String]): Unit = {
    val dirs = args.headOption.map(_.toInt).getOrElse(100)
    val files = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val n = dirs.toLong * dirs * files
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val root = s"$out/tree_${dirs}x${dirs}x$files"
    val marker = java.nio.file.Paths.get(s"$root/_COMPLETE_MARKER_g1")

    // build once, in parallel (1 M create() calls are fs-bound)
    if (!java.nio.file.Files.exists(marker)) {
      println(s"building $n-file tree at $root")
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      val payload = Array[Byte]('x')
      (0 until dirs).foreach { a =>
        pool.submit(new Runnable {
          override def run(): Unit =
            (0 until dirs).foreach { b =>
              val d = java.nio.file.Paths.get(f"$root/d$a%03d/d$b%03d")
              java.nio.file.Files.createDirectories(d)
              (0 until files).foreach { f =>
                java.nio.file.Files.write(d.resolve(f"f$f%05d.dat"), payload)
              }
            }
        })
      }
      pool.shutdown()
      pool.awaitTermination(2, java.util.concurrent.TimeUnit.HOURS)
      java.nio.file.Files.write(marker, Array.emptyByteArray)
      println(f"built in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } else println(s"tree cached at $root")

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def usedHeap(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      val r = Runtime.getRuntime
      r.totalMemory() - r.freeMemory()
    }

    val tasks = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          tasks.incrementAndGet()
      })

    def measure(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val h0 = usedHeap()
      tasks.set(0L)
      val t0 = System.nanoTime()
      val row = mk.agg(count(lit(1)), sum(col("size"))).head()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.Bridge
        .waitListenerBusEmpty(spark.sparkContext)
      val h1 = usedHeap()
      println(f"$label%-16s rows=${row.getLong(0)} bytes=${row.getLong(1)} " +
        f"wall=$wall%8.1f s  tasks=${tasks.get()}%5d  " +
        f"driverHeapDelta=${(h1 - h0) / 1000000L}%6d MB")
    }

    // distributed first (cold page cache is the realistic case for
    // BOTH, but ordering favors the path we claim is slower — any
    // cache warming benefits the driver-side walk measured second)
    measure("scanDistributed") {
      graft.sources.TreeScan.scanDistributed(spark, root)
        .filter(!col("name").startsWith("_")) // exclude the marker
    }
    measure("scan (driver)") {
      graft.sources.TreeScan.scan(spark, root)
        .filter(!col("name").startsWith("_"))
    }
    spark.stop()
  }
}
