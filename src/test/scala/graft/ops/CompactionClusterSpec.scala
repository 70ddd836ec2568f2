package graft.ops

import graft.SparkSpec
import graft.functions.ZOrderCode
import org.apache.spark.sql.functions._

/** Clustered compaction — the scan-side layout lever: sorted rewrites
  * must (a) preserve rows/schema exactly, and (b) produce row-group
  * min/max statistics that actually PRUNE, measured straight from the
  * parquet footers via [[Compaction.prunableFraction]] (the same
  * statistics the pushed-filter reader consults, so the assertion is
  * on the real skipping mechanism, not a proxy). The unclustered
  * control pins the other side: scrambled layout prunes ~nothing.
  */
class CompactionClusterSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** 200 k rows with two independent 16-bit keys in SCRAMBLED row
    * order (multiplicative hashes of the id), plus a payload fat
    * enough to split files into many row groups at a small block size.
    */
  private def scrambled(n: Int = 200000) =
    (0 until n).map { i =>
      val x = (i.toLong * 48271) % 65536
      val y = (i.toLong * 16807) % 65536
      (i.toLong, x, y, "p" * 64 + i)
    }.toDF("id", "x", "y", "payload")

  test("single-column clustering: parity, schema, and real pruning") {
    val root = tmp("graft_cluster_")
    val src = s"$root/src"
    val dst = s"$root/dst"
    scrambled().repartition(8).write.parquet(src)

    val report = Compaction.compactClustered(spark, src, dst,
      clusterCols = Seq(col("x")),
      targetFileBytes = 4L * 1024 * 1024,
      targetRowGroupBytes = 256L * 1024)
    report.rowsAfter shouldBe 200000L
    report.rowGroupsAfter should be >= 8L // sizing still applies

    // schema identical — no __cluster_* leakage
    val back = spark.read.parquet(dst)
    back.columns.toSeq shouldBe Seq("id", "x", "y", "payload")

    // content identical (order-free): same multiset of rows
    back.exceptAll(spark.read.parquet(src)).count() shouldBe 0L
    spark.read.parquet(src).exceptAll(back).count() shouldBe 0L

    // a ~1% range predicate on the cluster key skips ≥ 90% of row
    // groups from the footers; the scrambled source skips ~none
    Compaction.prunableFraction(spark, dst, "x", 1000, 1639) should be >= 0.9
    Compaction.prunableFraction(spark, src, "x", 1000, 1639) should be <= 0.1
  }

  test("z-order clustering prunes on BOTH dimensions; 1-D sort does not") {
    val root = tmp("graft_zorder_")
    val src = s"$root/src"
    val zdst = s"$root/zdst"
    val xdst = s"$root/xdst"
    scrambled().repartition(8).write.parquet(src)

    Compaction.compactClustered(spark, src, zdst,
      clusterCols = Seq(ZOrderCode.zorder(col("x"), col("y"))),
      targetFileBytes = 4L * 1024 * 1024,
      targetRowGroupBytes = 256L * 1024)
    Compaction.compactClustered(spark, src, xdst,
      clusterCols = Seq(col("x")),
      targetFileBytes = 4L * 1024 * 1024,
      targetRowGroupBytes = 256L * 1024)

    // the x-sorted layout is perfect on x, blind on y
    Compaction.prunableFraction(spark, xdst, "x", 1000, 1639) should be >= 0.9
    Compaction.prunableFraction(spark, xdst, "y", 1000, 1639) should be <= 0.1
    // the z-ordered layout prunes substantially on BOTH dimensions
    // (each row group covers one compact z-interval ≈ one square-ish
    // (x, y) neighborhood, so its min/max are tight in both)
    Compaction.prunableFraction(spark, zdst, "x", 1000, 1639) should be >= 0.5
    Compaction.prunableFraction(spark, zdst, "y", 1000, 1639) should be >= 0.5
    // the conjunction dial: a group survives only if BOTH intervals
    // overlap it, so the joint skip is at least each single-column one
    val jx = Compaction.prunableFraction(spark, zdst, "x", 1000, 1639)
    val jy = Compaction.prunableFraction(spark, zdst, "y", 1000, 1639)
    val joint = Compaction.prunableFractionAll(spark, zdst,
      Seq(("x", 1000L, 1639L), ("y", 1000L, 1639L)))
    joint should be >= math.max(jx, jy)
    // and on the x-sorted layout the conjunction is exactly x's dial
    // (y never prunes there)
    Compaction.prunableFractionAll(spark, xdst,
      Seq(("x", 1000L, 1639L), ("y", 1000L, 1639L))) shouldBe
      Compaction.prunableFraction(spark, xdst, "x", 1000, 1639)

    // and the rewrite is still content-preserving
    val back = spark.read.parquet(zdst)
    back.exceptAll(spark.read.parquet(src)).count() shouldBe 0L
    back.count() shouldBe 200000L
  }

  test("derived clustering expression never collides with user columns") {
    val root = tmp("graft_cluster_collide_")
    val src = s"$root/src"
    Seq((1L, 2L)).toDF("id", "__cluster_0").write.parquet(src)
    val e = the[IllegalArgumentException] thrownBy
      Compaction.compactClustered(spark, src, s"$root/dst",
        clusterCols = Seq(col("id")))
    e.getMessage should include("__cluster_0")
  }

  test("compactTree clusters within each Hive leaf; partitioning survives") {
    val root = tmp("graft_tree_cluster_")
    val src = s"$root/src"
    val dst = s"$root/dst"
    scrambled().withColumn("part", pmod(col("id"), lit(2L)))
      .repartition(8).write.partitionBy("part").parquet(src)

    val reports = Compaction.compactTree(spark, src, dst,
      targetFileBytes = 4L * 1024 * 1024,
      targetRowGroupBytes = 256L * 1024,
      parallelism = 2,
      clusterCols = Seq(col("x")))
    reports.map(_._1).sorted shouldBe Seq("part=0", "part=1")
    reports.map(_._2.rowsAfter).sum shouldBe 200000L

    // partition recovery: the read reconstructs part from the dirs
    // (directory-inferred partition values come back as int)
    val back = spark.read.parquet(dst)
    back.select(col("part").cast("long"), col("id"))
      .groupBy(col("part")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(0L -> 100000L, 1L -> 100000L)

    // every leaf is clustered: footer pruning holds per leaf
    for (leaf <- Seq("part=0", "part=1")) {
      Compaction.prunableFraction(
        spark, s"$dst/$leaf", "x", 1000, 1639) should be >= 0.9
      Compaction.prunableFraction(
        spark, s"$src/$leaf", "x", 1000, 1639) should be <= 0.1
    }
  }

  test("compactTree composes clustering with blooms per leaf") {
    val root = tmp("graft_tree_bloom_")
    val src = s"$root/src"
    val dst = s"$root/dst"
    scrambled().withColumn("part", pmod(col("id"), lit(2L)))
      .repartition(8).write.partitionBy("part").parquet(src)

    Compaction.compactTree(spark, src, dst,
      targetFileBytes = 4L * 1024 * 1024,
      targetRowGroupBytes = 256L * 1024,
      parallelism = 2,
      clusterCols = Seq(col("x")),
      bloomColumns = Map("id" -> 8192L))
    // every leaf: clustered on x AND bloom'd on the high-card id
    for (leaf <- Seq("part=0", "part=1")) {
      Compaction.prunableFraction(
        spark, s"$dst/$leaf", "x", 1000, 1639) should be >= 0.9
      Compaction.bloomFilteredColumns(spark, s"$dst/$leaf") shouldBe Seq("id")
    }
    // and the audits walk the TREE ROOT directly (partitioned tables
    // are the production shape — a flat-dir-only dial wouldn't cover
    // them): all leaves' row groups in one population
    Compaction.prunableFraction(spark, dst, "x", 1000, 1639) should be >= 0.9
    Compaction.bloomFilteredColumns(spark, dst) shouldBe Seq("id")
    spark.read.parquet(dst).count() shouldBe 200000L
  }

  test("bloom filters: written per row group, audited from footers, " +
       "lookups stay correct") {
    val root = tmp("graft_bloom_")
    val src = s"$root/src"
    scrambled().repartition(4).write.parquet(src)

    // without the option: no column carries a bloom
    Compaction.compactTo(spark, src, s"$root/plain",
      targetFileBytes = 4L * 1024 * 1024,
      targetRowGroupBytes = 256L * 1024)
    Compaction.bloomFilteredColumns(spark, s"$root/plain") shouldBe empty

    // with it: id blooms present in EVERY row group, other columns not;
    // works through the clustered face too (bloom on the un-sorted
    // column complements range stats on the sorted one)
    Compaction.compactClustered(spark, src, s"$root/bloom",
      clusterCols = Seq(col("x")),
      targetFileBytes = 4L * 1024 * 1024,
      targetRowGroupBytes = 256L * 1024,
      bloomColumns = Map("id" -> 10000L))
    Compaction.bloomFilteredColumns(spark, s"$root/bloom") shouldBe Seq("id")

    // point lookups through the bloom layout: present and absent ids
    val got = spark.read.parquet(s"$root/bloom")
      .filter(col("id").isin(7L, 123456L, 199999L, 7777777L))
      .select(col("id")).as[Long].collect().sorted
    got shouldBe Array(7L, 123456L, 199999L)

    // misuse guard: a non-positive NDV is a loud error, not a silent
    // default-sized filter
    an[IllegalArgumentException] should be thrownBy
      Compaction.compactTo(spark, src, s"$root/bad",
        bloomColumns = Map("id" -> 0L))
  }

  test("string dimension: ranked clustering prunes the RAW string " +
       "column's pushed predicates, audited from string footer stats") {
    val root = tmp("graft_cluster_str_")
    val src = s"$root/src"
    val dst = s"$root/dst"
    val zdst = s"$root/zdst"
    // independent string key (40 values, scrambled like x/y)
    val df = scrambled().withColumn("src",
      format_string("s%02d", pmod(col("id") * 69621L, lit(40L))))
    df.repartition(8).write.parquet(src)
    val dict = ZOrderCode.rankDictionary(spark.read.parquet(src), "src")
    dict should have size 40
    dict shouldBe dict.sorted

    // 1-D: cluster on the rank — equality on the raw STRING column
    // prunes via the string min/max stats (what the reader consults)
    Compaction.compactClustered(spark, src, dst,
      clusterCols = Seq(ZOrderCode.ranked(col("src"), dict)),
      targetFileBytes = 4L * 1024 * 1024,
      targetRowGroupBytes = 256L * 1024)
    Compaction.prunableFractionString(
      spark, dst, "src", "s17", "s17") should be >= 0.9
    Compaction.prunableFractionString(
      spark, src, "src", "s17", "s17") should be <= 0.1
    // the per-group ranges are real values, ordered
    val ranges = Compaction.stringColumnRanges(spark, dst, "src")
    ranges.flatten should not be empty
    all(ranges.flatten.map { case (mn, mx) => mn <= mx }) shouldBe true

    // 2-D: zorder(ranked(string), scaled(numeric)) prunes BOTH —
    // the (string, numeric) pair real curation tables filter on
    Compaction.compactClustered(spark, src, zdst,
      clusterCols = Seq(ZOrderCode.zorder(
        ZOrderCode.scaled(ZOrderCode.ranked(col("src"), dict),
          0L, dict.size - 1L, bits = 12),
        ZOrderCode.scaled(col("y"), 0L, 65535L, bits = 12))),
      targetFileBytes = 4L * 1024 * 1024,
      targetRowGroupBytes = 256L * 1024)
    Compaction.prunableFractionString(
      spark, zdst, "src", "s17", "s17") should be >= 0.5
    Compaction.prunableFraction(
      spark, zdst, "y", 1000, 1639) should be >= 0.5
    // content identical through the ranked rewrite
    spark.read.parquet(zdst).exceptAll(df).count() shouldBe 0L
    spark.read.parquet(zdst).count() shouldBe 200000L
  }

  test("high-NDV string keys: hashBucket clustering composes with a " +
       "bloom on the RAW string column (the takedown-audit shape)") {
    val root = tmp("graft_cluster_hb_")
    val src = s"$root/src"
    val dst = s"$root/dst"
    // ~44 k distinct string keys over 50 k rows — high-card, so parquet
    // writes real blooms (it omits them on dictionary-encoded chunks)
    val df = scrambled(50000).withColumn("key",
      concat(lit("user-"), (col("id") * 2654435761L % 1000000L).cast("string")))
    df.repartition(8).write.parquet(src)
    Compaction.compactClustered(spark, src, dst,
      clusterCols = Seq(ZOrderCode.hashBucket(col("key"), 20)),
      targetFileBytes = 4L * 1024 * 1024,
      targetRowGroupBytes = 256L * 1024,
      bloomColumns = Map("key" -> 2000L))
    // the bloom is present in EVERY row group, on the STRING column
    Compaction.bloomFilteredColumns(spark, dst) shouldBe Seq("key")
    // content round-trips through the derived-key rewrite
    val back = spark.read.parquet(dst)
    back.count() shouldBe 50000L
    back.columns.toSeq shouldBe Seq("id", "x", "y", "payload", "key")
    // equality lookups on the string key: a present key returns exactly
    // its rows, an absent one exactly none — the predicate the bloom
    // prunes and hashBucket co-locates (hash order is NOT string
    // order: string min/max stats cannot prune here, the bloom is the
    // mechanism — which is why the §9 rule pairs them)
    val presentKey = df.filter($"id" === 17L)
      .select($"key").as[String].head()
    val expect = df.filter($"key" === presentKey).count()
    back.filter($"key" === presentKey).count() shouldBe expect
    back.filter($"key" === "user-nosuch").count() shouldBe 0L
  }

  test("append cadence: appends never corrupt clustered row-group stats; " +
       "the dial decays by exactly the un-clustered tail and recluster " +
       "restores it") {
    val root = tmp("graft_cluster_append_")
    val src = s"$root/src"
    val live = s"$root/live"
    scrambled().repartition(8).write.parquet(src)
    Compaction.compactClustered(spark, src, live,
      clusterCols = Seq(col("x")),
      targetFileBytes = 4L * 1024 * 1024,
      targetRowGroupBytes = 256L * 1024)
    val baseRanges = Compaction.columnRanges(spark, live, "x").flatten
    val baseDial = Compaction.prunableFraction(spark, live, "x", 1000, 1639)
    baseDial should be >= 0.9
    val baseSkipped = baseRanges.count { case (mn, mx) => mx < 1000 || mn > 1639 }

    // three streaming-append batches of SCRAMBLED rows (the production
    // drift: appends land unclustered)
    (1 to 3).foreach { k =>
      (0 until 20000).map { i =>
        val id = 200000L + k * 100000L + i
        ((id, (id * 48271) % 65536, (id * 16807) % 65536, "p" * 64 + id))
      }.toDF("id", "x", "y", "payload")
        .coalesce(1).write.mode("append").parquet(live)
    }
    // (a) pre-existing row groups keep their EXACT ranges — appends
    // add files, they never rewrite clustered groups' stats
    val afterRanges = Compaction.columnRanges(spark, live, "x").flatten
    baseRanges.toSet.subsetOf(afterRanges.toSet) shouldBe true
    // (b) the dial decays by exactly the appended tail: the same base
    // groups still skip, the tail's domain-spanning groups never do,
    // so decayed = baseSkipped / totalGroups — the footer dial IS the
    // recluster-cadence instrument, no separate bookkeeping
    val tailGroups = afterRanges.size - baseRanges.size
    tailGroups should be >= 3
    val decayed = Compaction.prunableFraction(spark, live, "x", 1000, 1639)
    decayed shouldBe (baseSkipped.toDouble / afterRanges.size) +- 1e-12
    decayed should be < baseDial
    // (c) recluster restores the dial and loses nothing
    val restored = s"$root/restored"
    val rep = Compaction.compactClustered(spark, live, restored,
      clusterCols = Seq(col("x")),
      targetFileBytes = 4L * 1024 * 1024,
      targetRowGroupBytes = 256L * 1024)
    rep.rowsAfter shouldBe 260000L
    Compaction.prunableFraction(
      spark, restored, "x", 1000, 1639) should be >= 0.9
  }

  test("dictionary churn: unseen value throws on the stale dictionary; " +
       "extendRankedCluster extends + reclusters and both dims prune again") {
    val root = tmp("graft_cluster_churn_")
    val src = s"$root/src"
    val live = s"$root/live"
    // base corpus over a 40-value string domain, z-ordered on
    // (ranked(src), scaled(y)) — the q122 shape
    val df = scrambled().withColumn("src",
      format_string("s%02d", pmod(col("id") * 69621L, lit(40L))))
    df.repartition(8).write.parquet(src)
    val dict = ZOrderCode.rankDictionary(spark.read.parquet(src), "src")
    def cluster(d: Seq[String]) = Seq(ZOrderCode.zorder(
      ZOrderCode.scaled(ZOrderCode.ranked(col("src"), d),
        0L, d.size - 1L, bits = 12),
      ZOrderCode.scaled(col("y"), 0L, 65535L, bits = 12)))
    Compaction.compactClustered(spark, src, live,
      clusterCols = cluster(dict),
      targetFileBytes = 4L * 1024 * 1024,
      targetRowGroupBytes = 256L * 1024)
    val baseSrcDial = Compaction.prunableFractionString(
      spark, live, "src", "s17", "s17")
    baseSrcDial should be >= 0.5

    // an appended batch carrying a NEW dictionary value (a new source
    // arriving — the churn event)
    (0 until 20000).map { i =>
      val id = 300000L + i
      (id, (id * 48271) % 65536, (id * 16807) % 65536, "p" * 64 + id,
        if (i % 4 == 0) "s99new" else f"s${(id * 69621L) % 40}%02d")
    }.toDF("id", "x", "y", "payload", "src")
      .coalesce(1).write.mode("append").parquet(live)

    // the stale dictionary now THROWS at scan time — loud, not a
    // silent fold of the new source into some existing neighborhood
    val e = the[Exception] thrownBy
      spark.read.parquet(live)
        .select(ZOrderCode.ranked(col("src"), dict).as("r"))
        .agg(sum(col("r"))).collect()
    e.getMessage should include("not in dictionary")

    // the maintenance-window recovery: extend + recluster
    val restored = s"$root/restored"
    val (extended, rep) = Compaction.extendRankedCluster(spark, live,
      restored, "src", dict, cluster,
      targetFileBytes = 4L * 1024 * 1024,
      targetRowGroupBytes = 256L * 1024)
    // extension, never replacement: old domain ⊆ new, new value ranked
    extended should contain allElementsOf dict
    extended should contain("s99new")
    extended shouldBe extended.sorted(ZOrderCode.byteOrdering)
    rep.rowsAfter shouldBe 220000L
    // reads resume: ranked() over the live data no longer throws...
    spark.read.parquet(restored)
      .select(ZOrderCode.ranked(col("src"), extended).as("r"))
      .agg(count(col("r"))).collect()(0).getLong(0) shouldBe 220000L
    // ...and the dial is restored on BOTH dimensions, including for
    // the NEW value (which clusters like any other now)
    Compaction.prunableFractionString(
      spark, restored, "src", "s17", "s17") should be >= 0.5
    Compaction.prunableFractionString(
      spark, restored, "src", "s99new", "s99new") should be >= 0.5
    Compaction.prunableFraction(
      spark, restored, "y", 1000, 1639) should be >= 0.5
    // nothing lost through the churn recovery
    spark.read.parquet(restored).exceptAll(
      spark.read.parquet(live)).count() shouldBe 0L

    // past the low-NDV regime the extension REFUSES toward hashBucket
    val wide = the[IllegalArgumentException] thrownBy
      Compaction.extendRankedCluster(spark, live, s"$root/wide", "src",
        dict, cluster, maxNdv = 40)
    wide.getMessage should include("hashBucket")
  }

  test("empty clusterCols is rejected toward compactTo") {
    val root = tmp("graft_cluster_empty_")
    val src = s"$root/src"
    Seq((1L, "a")).toDF("id", "v").write.parquet(src)
    val e = the[IllegalArgumentException] thrownBy
      Compaction.compactClustered(spark, src, s"$root/dst", Nil)
    e.getMessage should include("compactTo")
  }
}
