package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement behind the scan-clustering claims (BASELINE.md §"Scan
  * clustering", `Compaction.compactClustered` scaladoc): rewrite the
  * same table under three layouts and price a selective range
  * predicate on each —
  *
  *   random   : compactTo (size-only maintenance; min/max stats of a
  *              random layout span the full domain → nothing prunes)
  *   sort-x   : compactClustered on x (perfect pruning on x, none on y)
  *   zorder   : compactClustered on zorder_code(x, y) (real pruning on
  *              BOTH dimensions — the lakehouse trade)
  *
  * For each layout it reports the FOOTER-predicted read fraction
  * (1 − `Compaction.prunableFraction`) for an x-range, a y-range, and
  * the conjunction, then the measured wall-clock of the same three
  * aggregating scans — the probe exists to show the footer number IS
  * the wall-clock number, i.e. `prunableFraction` is a trustworthy
  * O(footers) dial for "is this table clustered for its workload?"
  * without running the workload.
  *
  * Fixture: `rows` (default 8 M) rows of two independent uniform
  * 31-bit keys + a ~256-byte incompressible payload, cached under
  * SPARK_GRAFT_SCALE_DIR with the ScaleTrend version-token discipline.
  * Layouts are rebuilt per run (the rewrite price is part of the
  * report: clustering is a maintenance op, its cost must be on the
  * same page as its benefit). File/row-group targets are scaled down
  * (32 MB / 4 MB) so the probe's ~200 MB table carries the same
  * files × row-groups granularity a 512 MB/128 MB production layout
  * gives a 100 TB table.
  *
  * Usage: `SkippingProbe [rows] [selectivityPpm]` (defaults 8000000,
  * 1000 ppm = 0.1%).
  */
object SkippingProbe {

  private val GenVersion = "z3" // z3: + 500-NDV string key for the ranked phase

  /** ~256 B of incompressible payload per row: small enough to build
    * fast, big enough that row-group DECODE (not per-task fixed
    * overhead) dominates the scan — the regime a 100 TB table is
    * always in, and the one where skipped row groups are visible
    * wall-clock, not just footer arithmetic. `src` is the low-NDV
    * STRING key (500 values) the ranked-clustering phase prices —
    * the (source, lang, url_host) shape of real curation tables.
    */
  private def fixture(spark: SparkSession, rows: Long, out: String): String = {
    val path = s"$out/zprobe_src_${rows}_$GenVersion"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      spark.range(rows).select(
          col("id"),
          pmod(xxhash64(col("id"), lit(1)), lit(1L << 31)).as("x"),
          pmod(xxhash64(col("id"), lit(2)), lit(1L << 31)).as("y"),
          format_string("s%03d",
            pmod(xxhash64(col("id"), lit(3)), lit(500L))).as("src"),
          concat((1 to 4).map(i =>
            sha2(concat(col("id").cast("string"), lit(s"#$i")), 256)): _*)
            .as("payload"))
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** The selective scan: decode the payload of every surviving row —
    * so skipped row groups are exactly the work not done.
    */
  private def scan(spark: SparkSession, dir: String,
                   pred: org.apache.spark.sql.Column): (Long, Double) = {
    val (row, t) = timed {
      spark.read.parquet(dir).filter(pred)
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
        .collect()(0)
    }
    (row.getLong(0), t)
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(8000000L)
    val ppm = args.drop(1).headOption.map(_.toLong).getOrElse(1000L)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", out + "/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val src = fixture(spark, rows, out)
    val domain = 1L << 31
    val width = domain / 1000000L * ppm
    val xLo = domain / 3; val yLo = domain / 5
    val xPred = col("x").between(xLo, xLo + width - 1)
    val yPred = col("y").between(yLo, yLo + width - 1)
    println(s"fixture: $src rows=$rows predicate width=$width " +
      s"(${ppm} ppm of the 31-bit domain per dimension)")

    val fileB = 32L * 1024 * 1024
    val groupB = 4L * 1024 * 1024
    // the four rewrites total ~4x the table — delete even on a crashed
    // run (an OOM'd probe must not strand tens of GB under /tmp)
    val work = java.nio.file.Files.createTempDirectory("zprobe_").toString
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))))

    val layouts: Seq[(String, String => graft.ops.Compaction.Report)] = Seq(
      "random" -> ((dst: String) =>
        graft.ops.Compaction.compactTo(spark, src, dst, fileB, groupB)),
      "sort-x" -> ((dst: String) =>
        graft.ops.Compaction.compactClustered(spark, src, dst,
          Seq(col("x")), fileB, groupB)),
      "zorder" -> ((dst: String) =>
        graft.ops.Compaction.compactClustered(spark, src, dst,
          Seq(graft.functions.ZOrderCode.zorder(col("x"), col("y"))),
          fileB, groupB))
    )

    // Build every layout first, then time the scans round-robin over
    // three passes taking the per-cell minimum — an in-order sweep
    // hands later layouts a JIT-warm scan path and the comparison
    // reads as a warmup artifact (observed: the first layout's scans
    // 2-4x slower than identical work later in the same JVM).
    val built = layouts.map { case (name, build) =>
      val dst = s"$work/$name"
      val (rep, tBuild) = timed(build(dst))
      (name, dst, rep, tBuild)
    }
    val preds = Seq("x" -> xPred, "y" -> yPred, "both" -> (xPred && yPred))
    val best = collection.mutable.Map[(String, String), (Long, Double)]()
    for (_ <- 1 to 3; (name, dst, _, _) <- built; (pn, p) <- preds) {
      val (n, t) = scan(spark, dst, p)
      val cur = best.get((name, pn))
      if (cur.forall(_._2 > t)) best((name, pn)) = (n, t)
    }
    // staged cleanup: at 32 M rows each layout is ~8 GB, and holding
    // all seven phase layouts at once exceeded the sandbox disk (the
    // run died ENOSPC mid-recluster) — delete each layout the moment
    // its last phase is done
    def drop(dirs: String*): Unit = dirs.foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    for ((name, dst, rep, tBuild) <- built) {
      // footer-predicted read fractions (ONE footer sweep for all
      // three dials — per dimension and the conjunction)
      val xp = ("x", xLo, xLo + width - 1)
      val yp = ("y", yLo, yLo + width - 1)
      val stats = graft.ops.Compaction.columnRangesAll(
        spark, dst, Seq("x", "y"))
      def read(ps: (String, Long, Long)*): Double =
        1.0 - stats.count(g => ps.exists { case (c, lo, hi) =>
          g(c).exists { case (mn, mx) => mx < lo || mn > hi }
        }).toDouble / stats.size
      val (readX, readY, readBoth) = (read(xp), read(yp), read(xp, yp))
      val (nx, tx) = best((name, "x")); val (ny, ty) = best((name, "y"))
      val (nb, tb) = best((name, "both"))
      println(f"$name%-7s rewrite=$tBuild%6.1fs files=${rep.filesAfter}%3d " +
        f"rowGroups=${rep.rowGroupsAfter}%4d | footer read-frac " +
        f"x=$readX%5.3f y=$readY%5.3f both=$readBoth%5.3f | " +
        f"scan x=$tx%5.2fs ($nx rows) y=$ty%5.2fs ($ny rows) " +
        f"both=$tb%5.2fs ($nb rows)")
    }

    drop(s"$work/zorder") // scans + footer rows done; random/sort-x still live

    // Point-lookup phase: equality on the UNSORTED x column — the
    // takedown-audit predicate range stats can never prune (x is
    // hash-scattered, so every group's x min/max spans the domain; id
    // would be the wrong probe column — spark.range order survives the
    // coalesce, so id min/max is tight and already prunes). A
    // per-row-group bloom on x prunes definitely-absent groups AND
    // narrows a present value to the groups that really hold it. NDV
    // is per row group: rows / expected groups.
    val rgRows = math.max(1L, rows / (built.head._3.rowGroupsAfter max 1L))
    val bloomDst = s"$work/bloom"
    val (bloomRep, tBloom) = timed(graft.ops.Compaction.compactTo(
      spark, src, bloomDst, fileB, groupB,
      bloomColumns = Map("x" -> rgRows)))
    val plainDst = built.head._2 // the compactTo layout, no blooms
    // a present x: read one off a known row; an absent x: probe
    // candidates until one has no rows (each x is present w.p. ~1.5%)
    val srcDf = spark.read.parquet(src)
    val present = srcDf.filter(col("id") === rows / 3L)
      .select(col("x")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .head()
    val absent = (3L to 100L).map(_ * 1000003L + 7L)
      .find(v => srcDf.filter(col("x") === v).limit(1).count() == 0L)
      .getOrElse(sys.error("no absent x candidate found"))
    val lookups = Seq(
      "absent" -> (col("x") === absent),
      "present" -> (col("x") === present))
    val lbest = collection.mutable.Map[(String, String), (Long, Double)]()
    for (_ <- 1 to 3; (ln, p) <- lookups;
         (dn, dst) <- Seq("plain" -> plainDst, "bloom" -> bloomDst)) {
      val (n, t) = scan(spark, dst, p)
      val cur = lbest.get((dn, ln))
      if (cur.forall(_._2 > t)) lbest((dn, ln)) = (n, t)
    }
    println(f"bloom   rewrite=$tBloom%6.1fs files=${bloomRep.filesAfter}%3d " +
      f"rowGroups=${bloomRep.rowGroupsAfter}%4d ndv/group=$rgRows | " +
      f"x-lookup absent plain=${lbest(("plain", "absent"))._2}%5.2fs " +
      f"bloom=${lbest(("bloom", "absent"))._2}%5.2fs | " +
      f"present plain=${lbest(("plain", "present"))._2}%5.2fs " +
      f"bloom=${lbest(("bloom", "present"))._2}%5.2fs")

    // Append-cadence phase: the §9 "recluster past the read budget"
    // rule made a measured row. Appends land UNCLUSTERED (the
    // streaming-ingest shape); already-clustered row groups keep
    // pruning, so the footer read fraction must decay by EXACTLY the
    // tail's group share (predicted vs measured printed side by side)
    // and the same dial must predict the scan wall-clock; a recluster
    // restores both. No bookkeeping of which files are clustered —
    // the footer dial IS the cadence instrument.
    val live = s"$work/live"
    val fsConf = spark.sparkContext.hadoopConfiguration
    val lfs = new org.apache.hadoop.fs.Path(live).getFileSystem(fsConf)
    require(org.apache.hadoop.fs.FileUtil.copy(lfs,
      new org.apache.hadoop.fs.Path(s"$work/sort-x"), lfs,
      new org.apache.hadoop.fs.Path(live), false, fsConf),
      "append phase: copy of the sort-x layout failed")
    drop(s"$work/sort-x", bloomDst) // the live copy carries the phase
    def readFracX(dir: String): Double =
      1.0 - graft.ops.Compaction.prunableFraction(
        spark, dir, "x", xLo, xLo + width - 1)
    val baseGroups = graft.ops.Compaction.columnRanges(spark, live, "x")
    val baseSkipped = baseGroups.count(_.exists {
      case (mn, mx) => mx < xLo || mn > xLo + width - 1 })
    val (_, tLive0) = (1 to 3).map(_ => scan(spark, live, xPred)).minBy(_._2)
    println(f"append  base: rowGroups=${baseGroups.size}%4d " +
      f"read-frac=${readFracX(live)}%6.4f scan=$tLive0%5.2fs")
    val batchRows = rows / 50 // 2% per append batch
    (1 to 4).foreach { k =>
      spark.range(rows + (k - 1) * batchRows, rows + k * batchRows).select(
          col("id"),
          pmod(xxhash64(col("id"), lit(1)), lit(1L << 31)).as("x"),
          pmod(xxhash64(col("id"), lit(2)), lit(1L << 31)).as("y"),
          format_string("s%03d",
            pmod(xxhash64(col("id"), lit(3)), lit(500L))).as("src"),
          concat((1 to 4).map(i =>
            sha2(concat(col("id").cast("string"), lit(s"#$i")), 256)): _*)
            .as("payload"))
        .coalesce(1).write.mode("append")
        .option("parquet.block.size", groupB.toString).parquet(live)
      val groupsNow = graft.ops.Compaction.columnRanges(spark, live, "x")
      val predicted = 1.0 - baseSkipped.toDouble / groupsNow.size
      val (_, tK) = (1 to 3).map(_ => scan(spark, live, xPred)).minBy(_._2)
      println(f"append  +${k * 2}%2d%% tail: rowGroups=${groupsNow.size}%4d " +
        f"read-frac=${readFracX(live)}%6.4f " +
        f"(tail-predicted $predicted%6.4f) scan=$tK%5.2fs")
    }
    val reclustered = s"$work/reclustered"
    val (_, tRecluster) = timed(graft.ops.Compaction.compactClustered(
      spark, live, reclustered, Seq(col("x")), fileB, groupB))
    val (_, tR) = (1 to 3).map(_ =>
      scan(spark, reclustered, xPred)).minBy(_._2)
    println(f"append  recluster=$tRecluster%6.1fs " +
      f"read-frac=${readFracX(reclustered)}%6.4f scan=$tR%5.2fs")
    drop(live, reclustered)

    // String-dimension phase: the production-scale dial behind the
    // q122 gate — zorder(ranked(src), scaled(x)) over the 500-NDV
    // string key; an equality predicate pushed on the RAW string
    // column must read < 0.1 of row groups (footer stats), priced
    // against the random layout, with the numeric partner still live.
    import graft.functions.ZOrderCode.{ranked, rankDictionary, scaled, zorder}
    val dict = rankDictionary(spark.read.parquet(src), "src")
    val szDst = s"$work/string-z"
    val (_, tSz) = timed(graft.ops.Compaction.compactClustered(
      spark, src, szDst,
      Seq(zorder(scaled(ranked(col("src"), dict), 0L, dict.size - 1L, 12),
                 scaled(col("x"), 0L, (1L << 31) - 1, 12))),
      fileB, groupB))
    val probeVal = dict(dict.size / 2)
    def srcFrac(dir: String): Double =
      1.0 - graft.ops.Compaction.prunableFractionString(
        spark, dir, "src", probeVal, probeVal)
    val sPred = col("src") === probeVal
    val (nsz, tszScan) = (1 to 3).map(_ => scan(spark, szDst, sPred)).minBy(_._2)
    val (nrd, trdScan) = (1 to 3).map(_ =>
      scan(spark, plainDst, sPred)).minBy(_._2)
    println(f"string  rewrite=$tSz%6.1fs ndv=${dict.size} | src-eq " +
      f"read-frac z=${srcFrac(szDst)}%6.4f random=${srcFrac(plainDst)}%6.4f " +
      f"| scan z=$tszScan%5.2fs ($nsz rows) random=$trdScan%5.2fs ($nrd rows) " +
      f"| x-window read-frac z=${readFracX(szDst)}%6.4f")

    // Dictionary-churn phase: the §9 churn rule as a measured row
    // (r17 — `Compaction.extendRankedCluster`). A 2% appended batch
    // carries a NEW src value ('zzz-new' — past every s### in byte
    // order): the stale dictionary THROWS at scan time by design, and
    // the maintenance-window recovery (extend + recluster) restores
    // BOTH dials, including pruning for the new value. Reported:
    // recovery wall (== one clustered rewrite of base+tail — the same
    // price as the append-cadence recluster), dict growth, and the
    // restored read fractions.
    val churnBatch = rows / 50
    spark.range(rows * 2, rows * 2 + churnBatch).select(
        col("id"),
        pmod(xxhash64(col("id"), lit(1)), lit(1L << 31)).as("x"),
        pmod(xxhash64(col("id"), lit(2)), lit(1L << 31)).as("y"),
        when(col("id") % 4 === 0, "zzz-new")
          .otherwise(format_string("s%03d",
            pmod(xxhash64(col("id"), lit(3)), lit(500L)))).as("src"),
        concat((1 to 4).map(i =>
          sha2(concat(col("id").cast("string"), lit(s"#$i")), 256)): _*)
          .as("payload"))
      .coalesce(1).write.mode("append")
      .option("parquet.block.size", groupB.toString).parquet(szDst)
    val staleThrows =
      try {
        spark.read.parquet(szDst)
          .select(ranked(col("src"), dict).as("r"))
          .agg(count(col("r"))).collect()
        false
      } catch { case e: Exception =>
        e.getMessage != null && e.getMessage.contains("not in dictionary") ||
          Option(e.getCause).exists(c =>
            c.getMessage != null && c.getMessage.contains("not in dictionary"))
      }
    val churnDst = s"$work/churn"
    val ((dict2, _), tChurn) = timed(
      graft.ops.Compaction.extendRankedCluster(spark, szDst, churnDst,
        "src", dict,
        d => Seq(zorder(scaled(ranked(col("src"), d), 0L, d.size - 1L, 12),
                        scaled(col("x"), 0L, (1L << 31) - 1, 12))),
        fileB, groupB))
    def srcFracIn(dir: String, v: String): Double =
      1.0 - graft.ops.Compaction.prunableFractionString(spark, dir, "src", v, v)
    val (nNew, tNewScan) = (1 to 3).map(_ =>
      scan(spark, churnDst, col("src") === "zzz-new")).minBy(_._2)
    println(f"churn   staleThrows=$staleThrows extend+recluster=$tChurn%6.1fs " +
      f"ndv=${dict.size}->${dict2.size} | src-eq read-frac " +
      f"old=${srcFracIn(churnDst, probeVal)}%6.4f " +
      f"new=${srcFracIn(churnDst, "zzz-new")}%6.4f " +
      f"x-window=${readFracX(churnDst)}%6.4f | new-value scan=$tNewScan%5.2fs " +
      f"($nNew rows)")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    spark.stop()
  }
}
