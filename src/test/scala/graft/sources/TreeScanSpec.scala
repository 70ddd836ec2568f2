package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** Glob→regex compilation (reference rule dialect,
  * `core/engine.py:439-462`) and real-filesystem tree scan.
  */
class TreeScanSpec extends SparkSpec {

  test("globToRegex pins the oracle regexes used by q37") {
    // These exact strings are inlined in SourceQueries.q37Sql — if the
    // compiler changes, this test forces the oracle to follow.
    TreeScan.globToRegex("**/*.txt") shouldBe "^(?:[^/]+/)*[^/]*\\.txt$"
    TreeScan.globToRegex("src1*/**") shouldBe "^src1[^/]*/.*$"
    TreeScan.globToRegex("*/en/*") shouldBe "^[^/]*/en/[^/]*$"
  }

  test("glob semantics: *, ?, [...], **, dir-only, root") {
    def m(glob: String, path: String): Boolean =
      path.matches(TreeScan.globToRegex(glob))
    m("*.csv", "a.csv") shouldBe true
    m("*.csv", "d/a.csv") shouldBe false     // * stays within a segment
    m("**/*.csv", "d/e/a.csv") shouldBe true
    m("**/*.csv", "a.csv") shouldBe true     // '**/' spans zero dirs
    m("a?c", "abc") shouldBe true
    m("a?c", "a/c") shouldBe false
    m("[ab]x", "ax") shouldBe true
    m("[!ab]x", "cx") shouldBe true
    m("[!ab]x", "ax") shouldBe false
    m("data/", "data") shouldBe true         // trailing / = dir rule
    TreeScan.globToRegex(".") shouldBe "^$"   // root only
  }

  test("scan lists a real tree with depth and levels") {
    val root = Files.createTempDirectory("treescan").toFile
    Files.createDirectories(root.toPath.resolve("a/b"))
    Files.writeString(root.toPath.resolve("top.txt"), "x")
    Files.writeString(root.toPath.resolve("a/mid.txt"), "yy")
    Files.writeString(root.toPath.resolve("a/b/leaf.txt"), "zzz")
    val df = TreeScan.scan(spark, root.getAbsolutePath)
    df.count() shouldBe 3
    val byName = df.collect().map(r =>
      r.getAs[String]("name") -> r.getAs[Int]("depth")).toMap
    byName("top.txt") shouldBe 0
    byName("mid.txt") shouldBe 1
    byName("leaf.txt") shouldBe 2
    val lv = TreeScan.withLevels(df, "rel_path", 2)
    lv.where(lv("name") === "leaf.txt").select("level0", "level1")
      .collect().head.toSeq shouldBe Seq("a", "b")
  }

  test("scanDistributed returns a frame identical to scan (schema + rows)") {
    val root = Files.createTempDirectory("treescan-dist").toFile
    Files.createDirectories(root.toPath.resolve("src1/en"))
    Files.createDirectories(root.toPath.resolve("src2"))
    Files.writeString(root.toPath.resolve("readme.txt"), "r")
    Files.writeString(root.toPath.resolve("src1/en/doc.txt"), "dd")
    Files.writeString(root.toPath.resolve("src1/en/data.csv"), "c,v")
    Files.writeString(root.toPath.resolve("src2/notes.md"), "nnnn")
    val a = TreeScan.scan(spark, root.getAbsolutePath)
    val b = TreeScan.scanDistributed(spark, root.getAbsolutePath)
    // names + types must match exactly; nullability legitimately
    // differs (binaryFile marks source metadata nullable, a local
    // toDF of primitives does not) and affects no downstream operator
    b.schema.map(f => (f.name, f.dataType)) shouldBe
      a.schema.map(f => (f.name, f.dataType))
    val key = (r: org.apache.spark.sql.Row) => r.getAs[String]("rel_path")
    val rowsA = a.collect().sortBy(key).map(_.toSeq)
    val rowsB = b.collect().sortBy(key).map(_.toSeq)
    rowsB shouldBe rowsA
  }

  test("scanDistributed keeps special characters intact ('my file.txt', 'a+b.txt', '50%.txt')") {
    // pins the measured binaryFile contract: `path` is the plain
    // Path.toString rendering, NOT a percent-encoded URI — so no
    // decode runs and a literal '%' survives
    val root = Files.createTempDirectory("treescan-enc").toFile
    Files.writeString(root.toPath.resolve("my file.txt"), "x")
    Files.writeString(root.toPath.resolve("a+b.txt"), "yy")
    Files.writeString(root.toPath.resolve("50%.txt"), "zzz")
    val a = TreeScan.scan(spark, root.getAbsolutePath)
    val b = TreeScan.scanDistributed(spark, root.getAbsolutePath)
    val names = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.getAs[String]("name")).sorted.toSeq
    names(b) shouldBe Seq("50%.txt", "a+b.txt", "my file.txt")
    names(b) shouldBe names(a)
  }

  test("scanDistributed handles a root whose own path needs URI encoding") {
    // the strip pattern is built from the ENCODED qualified root, so a
    // root dir with a space must still yield clean relative paths
    val parent = Files.createTempDirectory("treescan enc root").toFile
    Files.createDirectories(parent.toPath.resolve("sub"))
    Files.writeString(parent.toPath.resolve("sub/f one.txt"), "x")
    val a = TreeScan.scan(spark, parent.getAbsolutePath)
    val b = TreeScan.scanDistributed(spark, parent.getAbsolutePath)
    val rows = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getAs[String]("rel_path"), r.getAs[Int]("depth"))).toSeq
    rows(b) shouldBe Seq(("sub/f one.txt", 1))
    rows(b) shouldBe rows(a)
  }

  test("scanDistributed plan prunes binaryFile content (metadata-only read)") {
    val root = Files.createTempDirectory("treescan-prune").toFile
    Files.writeString(root.toPath.resolve("f.txt"), "x")
    val plan = TreeScan.scanDistributed(spark, root.getAbsolutePath)
      .queryExecution.executedPlan.toString
    // column pruning must drop the bytes column from the scan itself
    plan should include("ReadSchema")
    plan should not include "content"
  }

  test("scanDistributed inventories a 50k-file tree: parallel, metadata-only, bounded time") {
    // The file-count regime the distributed path EXISTS for ([[TreeScan
    // .scanDistributed]] scaladoc): 200 dirs × 250 files. The top-level
    // dir count (200) exceeds spark.sql.sources
    // .parallelPartitionDiscovery.threshold (default 32), so the
    // InMemoryFileIndex lists via a Spark job — the distributed-listing
    // path, not the driver walk. Fixture is a persistent cache (building
    // 50k files dominates the suite otherwise), made concurrency-safe by
    // construction: each JVM builds into its OWN temp dir and atomically
    // renames it into the shared path, so the path EXISTING implies the
    // tree is complete — no marker to race on, and a loser of the rename
    // race just deletes its duplicate build. The shape is encoded in the
    // path, so changing the fixture definition gets a fresh cache.
    import org.apache.spark.sql.functions.{col, count, lit, max, sum}
    val nDirs = 200
    val perDir = 250
    val root = java.nio.file.Paths.get(s"/tmp/graft_bigtree_${nDirs}x$perDir")
    if (!Files.exists(root)) {
      val build = Files.createTempDirectory(
        java.nio.file.Paths.get("/tmp"), "graft_bigtree_build_")
      (0 until nDirs).foreach { d =>
        val dir = build.resolve(f"d$d%03d")
        Files.createDirectories(dir)
        (0 until perDir).foreach { f =>
          Files.write(dir.resolve(f"f$f%03d.bin"), new Array[Byte](f % 3 + 1))
        }
      }
      try Files.move(build, root, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        // another JVM's complete tree won the rename race (the exact
        // subtype varies with the errno mapping — EEXIST/ENOTEMPTY):
        // use theirs and drop ours. Same-filesystem rename is atomic,
        // so root existing can only mean a fully-built tree; if root
        // is NOT there the move failed for a real reason — rethrow.
        case e: java.nio.file.FileSystemException =>
          if (!Files.exists(root)) throw e
          import scala.jdk.CollectionConverters._
          val walk = Files.walk(build)
          try walk.iterator().asScala.toSeq.reverse
            .foreach(Files.deleteIfExists(_))
          finally walk.close()
      }
    }
    val t0 = System.nanoTime()
    val df = TreeScan.scanDistributed(spark, root.toString)
    val agg = df.agg(count(lit(1)).as("n"), sum(col("size")).as("bytes"),
      max(col("depth")).as("d")).head()
    val secs = (System.nanoTime() - t0) / 1e9
    agg.getLong(0) shouldBe (nDirs * perDir).toLong
    agg.getLong(1) shouldBe nDirs.toLong * (0 until perDir).map(_ % 3 + 1).sum
    agg.getInt(2) shouldBe 1
    // parallelism: 50k metadata rows must not collapse into one task
    df.rdd.getNumPartitions should be > 1
    // metadata-only: no file bytes in the scan schema
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "content"
    // listing + aggregate wall bound — generous for this
    // variance-prone host (typical: a few seconds), but it fails the
    // regression that matters: a driver-side serial walk or a
    // bytes-reading scan at this file count blows far past it
    secs should be < 90.0
  }
}
