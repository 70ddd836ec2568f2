package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Dev tool behind the BASELINE.md "spill sensitivity" follow-ups:
  * the q47/q30 LSH candidate-pair self-join is the one stage in the
  * ~100× trend runs that swung 79.8 → 232 s under disk contention at
  * 8 M docs.
  *
  * Round 10 used this to measure the PARTITION-COUNT lever (verdict:
  * negative — partitions are not the lever; the table in BASELINE.md
  * stands). Round 11 extends it to the named residual: AQE SKEW-SPLIT
  * of the oversized join partitions, run as config VARIANTS over the
  * same fixture —
  *
  *  - `off`     : AQE disabled (the pure static plan)
  *  - `default` : AQE on, stock thresholds (what Bench runs; the
  *                256 MB skew threshold sits just above the measured
  *                ~230 MB/partition at 8 M docs, so no split fires)
  *  - `skewNN`  : AQE on, skew-join thresholds sized to the fixture
  *                (factor 1, threshold = advisory = NN MB)
  *  - `skewNNfF`: same with skewedPartitionFactor = F. The capped
  *                pair stage is UNIFORMLY large (~230 MB/partition at
  *                8 M docs / 32 parts, no degenerate bucket once the
  *                cap holds), and skew detection is RELATIVE
  *                (size > max(threshold, factor × median)) — factor 1
  *                can never mark a uniform stage. A tiny factor
  *                (e.g. f0.01) reduces the condition to
  *                size > threshold, i.e. "split everything oversized",
  *                which is the only way AQE splits uniform-large
  *                partitions.
  *
  * Each variant runs the LAZY pair plan twice on a warm JVM (second
  * run reported, ScaleTrend's convention) via its own QueryExecution
  * (`toRdd.count`), so the post-run adaptive plan can be inspected:
  * the `skew` column counts `skew=true` join marks in the final plan
  * — the executable "did the split actually fire" check, same
  * assertion SkewJoinSpec pins at spec scale. Spill accounting
  * brackets each run with task-metric deltas, drained
  * deterministically via the listener-bus bridge.
  *
  * NOTE: the lazy path skips lshNearDupPairs' final localCheckpoint
  * write, so wall times here are comparable WITHIN this table, not
  * with the round-10 partition table (which timed the checkpointing
  * entry point).
  *
  * Usage: `SpillProbe [docsN] [parts,...] [variants,...]` (defaults
  * 8000000, 32, default,skew64,off,skew64f0.01 — AQE variants first
  * so an "AQE is slower" reading can't be an artifact of runs
  * drifting as the disk heats up).
  */
object SpillProbe {

  def main(args: Array[String]): Unit = {
    val docsN = args.headOption.map(_.toLong).getOrElse(8000000L)
    val partSettings = args.drop(1).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(32))
    val variants = args.drop(2).headOption
      .map(_.split(",").toSeq)
      .getOrElse(Seq("default", "skew64", "off", "skew64f0.01"))
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
    val tasks = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
        tasks.incrementAndGet()
      }
    })

    // ScaleTrend owns the corpus generator AND the cache-path scheme —
    // sharing both (incl. the generator-version token in the path)
    // means this probe can never measure a fixture that a different
    // generator version wrote
    val docs = spark.read.parquet(ScaleTrend.docsFixture(spark, docsN, out))

    def applyVariant(v: String): Unit = v match {
      case "off" =>
        spark.conf.set("spark.sql.adaptive.enabled", "false")
      case "default" =>
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        Seq("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes")
          .foreach(spark.conf.unset)
      // isolating variants: advisory-only vs skew-thresholds-only,
      // to attribute any wall delta to the exact conf that moves it
      case s if s.startsWith("adv") =>
        val mb = s.stripPrefix("adv").toInt
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        Seq("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
          .foreach(spark.conf.unset)
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", s"${mb}m")
      case s if s.startsWith("thresh") =>
        val mb = s.stripPrefix("thresh").toInt
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", s"${mb}m")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      case s if s.startsWith("skew") =>
        val (mb, factor) = s.stripPrefix("skew").split("f") match {
          case Array(m)    => (m.toInt, "1.0")
          case Array(m, f) => (m.toInt, f)
        }
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", factor)
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", s"${mb}m")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", s"${mb}m")
      case other => sys.error(s"unknown variant: $other")
    }

    // one timed execution of the lazy pair plan (cap 200, ScaleTrend's
    // apples-to-apples setting). The metric snapshot brackets EXACTLY
    // the timed toRdd.count: lshNearDupPairsLazy runs eager work of
    // its own (the cap census head() + the signature persists), and
    // snapshotting before plan construction would attribute those
    // stages' spill/shuffle bytes to a wall time that excludes them.
    def run(): (Double, Long, Int, Long, Long, Long, Long) = {
      // verify payload PINNED to shingle strings: the r10/r11 AQE-conf
      // tables in BASELINE.md were measured under the string payload,
      // and these lazy rows exist to be re-runnable against them — the
      // round-13 HashSets default would shave ~33% of memory spill for
      // payload reasons the conf variants would then misattribute.
      // Hash-payload footprint is measured by the fusedhash[off]
      // entry-point variants below.
      val (pairs, caches, _) = graft.ext.Dedup.lshNearDupPairsLazy(
        docs, "text", "doc_id", 1, 24, 3, 0.9, maxBucketSize = 200,
        verifyOn = graft.ext.Dedup.VerifyOn.Shingles)
      try {
        // drain census/persist task events BEFORE the baseline snapshot
        org.apache.spark.sql.graftbridge.Bridge
          .waitListenerBusEmpty(spark.sparkContext)
        val (m0, d0, w0, t0c) =
          (memSpill.get, diskSpill.get, shufWrite.get, tasks.get)
        val t0 = System.nanoTime()
        val rows = pairs.queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        // deterministic drain: task-end events lag job completion on a
        // loaded host, so a fixed sleep could attribute spill bytes to
        // the wrong run — wait until the bus is actually empty
        org.apache.spark.sql.graftbridge.Bridge
          .waitListenerBusEmpty(spark.sparkContext)
        val skews = "skew=true".r
          .findAllIn(pairs.queryExecution.executedPlan.toString).size
        (sec, rows, skews, memSpill.get - m0, diskSpill.get - d0,
          shufWrite.get - w0, tasks.get - t0c)
      } finally caches.foreach(_.unpersist())
    }

    // round-12 variants: the CHECKPOINTING entry points, timed whole —
    // `fused` = lshNearDupPairsWithStats (the shipped default),
    // `staged` = lshNearDupPairsStagedWithStats (band-at-a-time; the
    // r11 verdict's untested lever). Both include their internal
    // localCheckpoint writes, so they compare with EACH OTHER, not
    // with the lazy rows above. Staged prints per-band shuffle-write
    // splits via the onBandDone hook (counter snapshots WITHOUT a bus
    // drain — draining inside the hook would inflate the wall being
    // measured — so per-band splits are approximate; the bracketed
    // totals are exact).
    // round-13 variants: `fusedhash[off]` = the fused entry point with
    // VerifyOn.HashSets — the verify joins (the stage's measured
    // dominant shuffle/spill term) carry 52-bit hash arrays instead of
    // shingle strings, and the cached base frame drops the strings too.
    // `inc[off]` = LshIndex.incrementalPairs over the shared index
    // fixture (corpus = first 99% of ids) with the last 1% as the
    // batch — the per-batch footprint of corpus-growth dedup, bracketed
    // for bytes the way the ScaleTrend rows are for wall. The index
    // build is fixture work and runs OUTSIDE the bracket.
    def runEntry(staged: Boolean,
                 verifyOn: graft.ext.Dedup.VerifyOn =
                   graft.ext.Dedup.VerifyOn.Shingles): (Double, Long, Int, Long, Long, Long, Long) = {
      org.apache.spark.sql.graftbridge.Bridge
        .waitListenerBusEmpty(spark.sparkContext)
      val (m0, d0, w0, t0c) =
        (memSpill.get, diskSpill.get, shufWrite.get, tasks.get)
      val bandMarks = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Long)]
      val t0 = System.nanoTime()
      val pairs =
        if (staged)
          graft.ext.Dedup.lshNearDupPairsStagedWithStats(
            docs, "text", "doc_id", 1, 24, 3, 0.9, maxBucketSize = 200,
            onBandDone = b => bandMarks +=
              ((b, (System.nanoTime() - t0) / 1e9, shufWrite.get - w0)),
            verifyOn = verifyOn)._1
        else
          graft.ext.Dedup.lshNearDupPairsWithStats(
            docs, "text", "doc_id", 1, 24, 3, 0.9, maxBucketSize = 200,
            verifyOn = verifyOn)._1
      val rows = pairs.count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.Bridge
        .waitListenerBusEmpty(spark.sparkContext)
      if (bandMarks.nonEmpty) {
        val splits = bandMarks.map { case (b, s, w) =>
          f"band$b @${s}%.1fs ${w / 1e9}%.2fGB" }.mkString("  ")
        println(s"       per-band (cumulative, approx): $splits")
      }
      (sec, rows, 0, memSpill.get - m0, diskSpill.get - d0,
        shufWrite.get - w0, tasks.get - t0c)
    }

    def runInc(pct: Int): (Double, Long, Int, Long, Long, Long, Long) = {
      val idxPath = ScaleTrend.lshIndexFixture(spark, docsN, out, pct)
      val split = ScaleTrend.incSplitFor(docsN, pct)
      val batch = docs.filter(org.apache.spark.sql.functions.col("doc_id") >= split)
      org.apache.spark.sql.graftbridge.Bridge
        .waitListenerBusEmpty(spark.sparkContext)
      val (m0, d0, w0, t0c) =
        (memSpill.get, diskSpill.get, shufWrite.get, tasks.get)
      val t0 = System.nanoTime()
      val idx = graft.ext.LshIndex.load(spark, idxPath)
      val (pairs, _) = graft.ext.LshIndex.incrementalPairs(
        idx, batch, "text", threshold = 0.9, maxBucketSize = 200)
      val rows = pairs.count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.Bridge
        .waitListenerBusEmpty(spark.sparkContext)
      (sec, rows, 0, memSpill.get - m0, diskSpill.get - d0,
        shufWrite.get - w0, tasks.get - t0c)
    }

    println(f"${"parts"}%6s ${"variant"}%-9s ${"run"}%4s ${"sec"}%8s " +
      f"${"memSpill"}%12s ${"diskSpill"}%12s ${"shufWrite"}%12s ${"skew"}%5s " +
      f"${"tasks"}%6s   rows")
    partSettings.foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      variants.foreach { v =>
        // entry-point variants: "staged[off]" / "fused[off]" time the
        // checkpointing APIs under AQE default/off; everything else is
        // an AQE conf variant over the lazy plan (the r10/r11 tables)
        val (confV, path) = v match {
          case "staged"       => ("default", "staged")
          case "stagedoff"    => ("off", "staged")
          case "fused"        => ("default", "fused")
          case "fusedoff"     => ("off", "fused")
          case "fusedhash"    => ("default", "fusedhash")
          case "fusedhashoff" => ("off", "fusedhash")
          // incP<pct>[off] sizes the batch fraction (default 1%):
          // the r14 crossover seam — one 10%-batch row under the
          // shipped HashSets verify closes the mixed-protocol gap in
          // the rebuild-vs-incremental runbook row
          case "inc"          => ("default", "inc1")
          case "incoff"       => ("off", "inc1")
          case s if s.startsWith("incP") && s.endsWith("off") =>
            ("off", "inc" + s.stripPrefix("incP").stripSuffix("off"))
          case s if s.startsWith("incP") =>
            ("default", "inc" + s.stripPrefix("incP"))
          case other          => (other, "lazy")
        }
        applyVariant(confV)
        (1 to 2).foreach { i =>
          val (sec, rows, skews0, dm, dd, dw, dt) =
            if (path == "lazy") run()
            else if (path.startsWith("inc")) runInc(path.stripPrefix("inc").toInt)
            else runEntry(path == "staged",
              if (path == "fusedhash") graft.ext.Dedup.VerifyOn.HashSets
              else graft.ext.Dedup.VerifyOn.Shingles)
          // the skew-mark count comes from scanning the lazy plan's
          // executed tree; the entry points give no plan handle, so
          // print "-" rather than a fabricated 0
          val skews: String = if (path == "lazy") skews0.toString else "-"
          def gb(x: Long) = f"${x / 1e9}%.2f GB"
          println(f"$p%6d $v%-9s $i%4d $sec%8.1f ${gb(dm)}%12s " +
            f"${gb(dd)}%12s ${gb(dw)}%12s $skews%5s $dt%6d   $rows")
        }
      }
    }
    spark.stop()
  }
}
