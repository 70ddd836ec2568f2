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
}
