package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Layout maintenance: small-file coalesce and row-group sizing, with
  * the compacted tree verified through TreeScan (the same inventory a
  * maintenance pipeline would route on) and through the data itself.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("small-file compaction: 40 files become few, rows and values survive") {
    val root = tmp("graft_compact_")
    val src = s"$root/src"
    val dst = s"$root/dst"
    (1L to 4000L).map(i => (i, s"payload_$i")).toDF("id", "payload")
      .repartition(40).write.parquet(src)
    graft.sources.TreeScan.scan(spark, src)
      .filter($"name".endsWith(".parquet")).count() shouldBe 40L

    val report = Compaction.compactTo(spark, src, dst,
      targetFileBytes = 1L << 30, targetRowGroupBytes = 1L << 30)
    report.filesBefore shouldBe 40
    report.filesAfter shouldBe 1
    report.rowsBefore shouldBe 4000L
    report.rowsAfter shouldBe 4000L
    report.rowGroupsBefore shouldBe 40L // one group per tiny file
    report.rowGroupsAfter shouldBe 1L

    // TreeScan-verified: the compacted tree holds exactly one data file
    val inv = graft.sources.TreeScan.scan(spark, dst)
      .filter($"name".endsWith(".parquet")).collect()
    inv.length shouldBe 1
    // and the data is byte-for-value identical
    val back = spark.read.parquet(dst)
    back.count() shouldBe 4000L
    back.agg(sum($"id")).head().getLong(0) shouldBe (1L to 4000L).sum
    // source untouched: the swap is the caller's transactional step
    spark.read.parquet(src).count() shouldBe 4000L
  }

  test("row-group sizing: a tiny block-size target yields multiple groups per file") {
    val root = tmp("graft_compact_rg_")
    val src = s"$root/src"
    val dst = s"$root/dst"
    (1L to 20000L).map(i => (i, ("x" * 100) + i)).toDF("id", "payload")
      .repartition(10).write.parquet(src)
    val report = Compaction.compactTo(spark, src, dst,
      targetFileBytes = 1L << 30, targetRowGroupBytes = 256L * 1024)
    report.filesAfter shouldBe 1
    // the writer flushes a group roughly every targetRowGroupBytes of
    // buffered data — exact count is writer-internal, but a ~2 MB
    // table under a 256 KiB target must split into several groups
    report.rowGroupsAfter should be > 1L
    report.rowsAfter shouldBe 20000L
  }

  test("shuffle=true splits few files into many (the direction coalesce cannot)") {
    val root = tmp("graft_compact_split_")
    val src = s"$root/src"
    val dst = s"$root/dst"
    (1L to 20000L).map(i => (i, ("y" * 120) + i)).toDF("id", "payload")
      .coalesce(1).write.parquet(src)
    val (files0, _, _, bytes0) = Compaction.census(spark, src)
    files0 shouldBe 1
    val target = bytes0 / 4 + 1 // aim for ~4 output files
    val report = Compaction.compactTo(spark, src, dst,
      targetFileBytes = target, targetRowGroupBytes = target,
      shuffle = true)
    report.filesAfter should be >= 3
    report.rowsAfter shouldBe 20000L
    spark.read.parquet(dst).agg(sum($"id")).head().getLong(0) shouldBe
      (1L to 20000L).sum
  }

  test("census matches the read: extension-less part files counted, sidecars ignored and left in place") {
    val root = tmp("graft_compact_ext_")
    val src = s"$root/src"
    val dst = s"$root/dst"
    (1L to 3000L).map(i => (i, s"v_$i")).toDF("id", "payload")
      .repartition(3).write.parquet(src)
    // Hive/Impala-style layout: parquet part files carry no extension
    // (Files.move throws on failure — a silent rename miss would leave
    // this test green while never exercising the extension-less path)
    new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        java.nio.file.Files.move(f.toPath,
          f.toPath.resolveSibling(f.getName.stripSuffix(".parquet")))
      }
    // sidecars Spark's listing filter hides: an extra _-prefixed file
    // beyond the _SUCCESS Spark already wrote, and an in-flight copy
    java.nio.file.Files.write(
      java.nio.file.Paths.get(src, "_extra_metadata"),
      "sidecar".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(src, "part-9999.parquet._COPYING_"),
      "partial".getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val report = Compaction.compactTo(spark, src, dst,
      targetFileBytes = 1L << 30, targetRowGroupBytes = 1L << 30)
    // the extension-less files ARE the table — counted like the read reads them
    report.filesBefore shouldBe 3
    report.rowsBefore shouldBe 3000L
    report.rowsAfter shouldBe 3000L
    // sidecars: excluded from the census, untouched in the source
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(src, "_extra_metadata")) shouldBe true
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(src, "part-9999.parquet._COPYING_")) shouldBe true
    spark.read.parquet(dst).agg(sum($"id")).head().getLong(0) shouldBe
      (1L to 3000L).sum
  }

  test("empty source directory is rejected, not silently compacted to nothing") {
    val root = tmp("graft_compact_empty_")
    val src = s"$root/src"
    new java.io.File(src).mkdirs()
    val ex = intercept[IllegalArgumentException] {
      Compaction.compactTo(spark, src, s"$root/dst")
    }
    ex.getMessage should include("no parquet files")
  }

  test("census refuses a partitioned root with an explicit per-leaf error") {
    val root = tmp("graft_compact_part_")
    val src = s"$root/src"
    (1L to 1000L).map(i => (i, s"k${i % 3}", s"v_$i")).toDF("id", "k", "payload")
      .write.partitionBy("k").parquet(src)
    // the recursive read would see 1000 rows the top-level census never
    // counted — the old failure mode was a misleading "lost rows" throw
    // AFTER the rewrite; now the census names the real problem up front
    val ex = intercept[IllegalArgumentException] {
      Compaction.compactTo(spark, src, s"$root/dst")
    }
    ex.getMessage should include("compacts per leaf")
    ex.getMessage should include("compactTree")
    ex.getMessage should include("k=k0")
  }

  test("leafDirs: Hive leaves in order; root-is-leaf; mixed layout rejected") {
    val root = tmp("graft_compact_leaves_")
    val part = s"$root/part"
    (1L to 600L).map(i => (i, s"a${i % 2}", s"b${i % 3}", i.toString))
      .toDF("id", "ka", "kb", "v")
      .write.partitionBy("ka", "kb").parquet(part)
    Compaction.leafDirs(spark, part) shouldBe Seq(
      "ka=a0/kb=b0", "ka=a0/kb=b1", "ka=a0/kb=b2",
      "ka=a1/kb=b0", "ka=a1/kb=b1", "ka=a1/kb=b2")

    val flat = s"$root/flat"
    (1L to 10L).map(i => (i, "x")).toDF("id", "v").write.parquet(flat)
    Compaction.leafDirs(spark, flat) shouldBe Seq("")

    // files alongside partition dirs: not a layout partition discovery
    // accepts — named, not guessed at
    val mixed = s"$root/mixed"
    (1L to 10L).map(i => (i, s"m${i % 2}")).toDF("id", "k")
      .write.partitionBy("k").parquet(mixed)
    java.nio.file.Files.copy(
      new java.io.File(flat).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath,
      java.nio.file.Paths.get(mixed, "stray.parquet"))
    val ex = intercept[IllegalArgumentException] {
      Compaction.leafDirs(spark, mixed)
    }
    ex.getMessage should include("mixes data files")
  }

  test("compactTree: per-leaf compaction preserves partitioning, rows, and values") {
    val root = tmp("graft_compact_tree_")
    val src = s"$root/src"
    val dst = s"$root/dst"
    val df = (1L to 6000L).map(i => (i, s"p${i % 3}", s"payload_$i"))
      .toDF("id", "k", "payload")
    // fragment each leaf into exactly 4 files: four single-task appends
    (0 until 4).foreach { r =>
      df.filter($"id" % 4 === r).coalesce(1)
        .write.mode("append").partitionBy("k").parquet(src)
    }
    val reports = Compaction.compactTree(spark, src, dst,
      targetFileBytes = 1L << 30, targetRowGroupBytes = 1L << 30,
      parallelism = 3)
    reports.map(_._1) shouldBe Seq("k=p0", "k=p1", "k=p2")
    reports.foreach { case (rel, r) =>
      withClue(s"leaf $rel: ") {
        r.filesBefore shouldBe 4
        r.filesAfter shouldBe 1
        r.rowsAfter shouldBe 2000L
      }
    }
    // the compacted tree reads back as the same partitioned table
    val back = spark.read.parquet(dst)
    back.count() shouldBe 6000L
    back.groupBy($"k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("p0" -> 2000L, "p1" -> 2000L, "p2" -> 2000L)
    back.agg(sum($"id")).head().getLong(0) shouldBe (1L to 6000L).sum
    // unpartitioned root degenerates to a single root compaction
    val flatDst = s"$root/flat_dst"
    df.select($"id", $"payload").repartition(5).write.parquet(s"$root/flat")
    val flatReports = Compaction.compactTree(spark, s"$root/flat", flatDst)
    flatReports.map(_._1) shouldBe Seq("")
    flatReports.head._2.filesBefore shouldBe 5
    spark.read.parquet(flatDst).count() shouldBe 6000L
  }

  test("compactTree: a failing leaf surfaces only after every sibling settles") {
    val root = tmp("graft_compact_fail_")
    val src = s"$root/src"
    val dst = s"$root/dst"
    val df = (1L to 6000L).map(i => (i, s"p${i % 3}", s"payload_$i"))
      .toDF("id", "k", "payload")
    df.write.partitionBy("k").parquet(src)
    // sabotage the FIRST leaf (leaf order is sorted) with a corrupt
    // parquet file: its compactTo fails on read, and with
    // parallelism=3 the old first-failure Await returned while the
    // sibling leaves were still writing under dst in the background —
    // the zombie-write race the settle-then-throw contract rules out
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$src/k=p0/part-corrupt.parquet"),
      "not a parquet file".getBytes("UTF-8"))
    val ex = intercept[Exception] {
      Compaction.compactTree(spark, src, dst, parallelism = 3)
    }
    ex should not be null
    // every NON-sabotaged leaf finished its write before the throw:
    // a complete _SUCCESS-marked output it is safe to delete-and-retry
    Seq("k=p1", "k=p2").foreach { leaf =>
      withClue(s"leaf $leaf: ") {
        new java.io.File(s"$dst/$leaf/_SUCCESS").exists() shouldBe true
        spark.read.parquet(s"$dst/$leaf").count() shouldBe 2000L
      }
    }
  }

  test("footer audits refuse a root mixing files with subdirectories") {
    val root = tmp("graft_compact_fmix_")
    val mixed = s"$root/mixed"
    (1L to 100L).map(i => (i, s"m${i % 2}")).toDF("id", "k")
      .write.partitionBy("k").parquet(mixed)
    val flat = s"$root/flat"
    (1L to 10L).map(i => (i, i * 2)).toDF("id", "v").write.parquet(flat)
    java.nio.file.Files.copy(
      new java.io.File(flat).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath,
      java.nio.file.Paths.get(mixed, "stray.parquet"))
    // the old behavior audited ONLY the top-level stray file: a bloom
    // or clustering defect in the partition leaves would be reported
    // as absent/present from one unrepresentative file (ADVICE r15)
    Seq(
      ("bloomFilteredColumns", () =>
        Compaction.bloomFilteredColumns(spark, mixed)),
      ("columnRanges", () => Compaction.columnRanges(spark, mixed, "id")),
      ("prunableFraction", () =>
        Compaction.prunableFraction(spark, mixed, "id", 0L, 1L))
    ).foreach { case (name, audit) =>
      withClue(s"$name: ") {
        val ex = intercept[IllegalArgumentException](audit())
        ex.getMessage should include("mixes data files")
      }
    }
    // the pure-Hive tree still audits across every leaf (no throw)
    val stray = new java.io.File(s"$mixed/stray.parquet")
    stray.delete() shouldBe true
    Compaction.columnRanges(spark, mixed, "id").size should be >= 2
  }
}
