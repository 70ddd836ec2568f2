package graft.sinks

import graft.SparkSpec
import java.nio.file.Files

/** K9 file effects: backup preserving relative path, prefix rename,
  * delete (`processors/file_ops.py:17-168`).
  */
class FileOpsSpec extends SparkSpec {

  test("backup/rename/delete round-trip") {
    val root = Files.createTempDirectory("fileops")
    Files.createDirectories(root.resolve("sub"))
    Files.writeString(root.resolve("sub/data.txt"), "payload")
    val ops = new FileOps(spark)
    val src = root.toString
    val dst = Files.createTempDirectory("fileops_bak").toString

    ops.backup(src, "sub/data.txt", dst)
    ops.exists(s"$dst/sub/data.txt") shouldBe true

    ops.renameWithPrefix(s"$src/sub", "data.txt", "bak_")
    ops.exists(s"$src/sub/bak_data.txt") shouldBe true
    ops.exists(s"$src/sub/data.txt") shouldBe false

    ops.delete(s"$src/sub/bak_data.txt") shouldBe true
    ops.exists(s"$src/sub/bak_data.txt") shouldBe false
  }

  test("config-driven backup processor end-to-end (test_validate.py:26-67)") {
    // the reference's e2e validation: engine run over a real tree with
    // a glob-configured backup_file processor — backup lands, the
    // non-matching file does not, and the run log records the step.
    import graft.pipeline.{PipelinePlan, Registry, Runner}
    import graft.sources.TreeScan
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("validate_src")
    Files.writeString(root.resolve("example.txt"), "hello world\n")
    Files.writeString(root.resolve("skipme.bin"), "binary")
    val backupRoot = Files.createTempDirectory("validate_bak").toString

    val registry = new Registry
    registry.register("backup_file") { (df, cfg) =>
      // effect processor: the copy runs on EXECUTORS per partition
      // (the 100 TB shape — the driver never sees the file list); the
      // frame passes through with an audit column
      val (srcRoot, dstRoot) = (cfg("src_root"), cfg("backup_dir"))
      df.select(col("rel_path")).foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
          val conf = new org.apache.hadoop.conf.Configuration()
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(srcRoot).resolve("/"), conf)
          rows.foreach { r =>
            val rel = r.getString(0)
            val dst = new org.apache.hadoop.fs.Path(s"$dstRoot/$rel")
            fs.mkdirs(dst.getParent)
            org.apache.hadoop.fs.FileUtil.copy(
              fs, new org.apache.hadoop.fs.Path(s"$srcRoot/$rel"),
              fs, dst, false, true, conf)
          }
      }
      df.withColumn("backed_up", lit(true))
    }

    val plan = PipelinePlan.parseConfig(Seq(
      s"rule pattern=**/*.txt processor=backup_file " +
        s"cfg.src_root=${root.toString} cfg.backup_dir=$backupRoot"))
    val result = new Runner(registry)
      .run(TreeScan.scan(spark, root.toString), plan)

    val ops = new FileOps(spark)
    ops.exists(s"$backupRoot/example.txt") shouldBe true
    ops.exists(s"$backupRoot/skipme.bin") shouldBe false
    val step = result.steps.find(_.processor == "backup_file").get
    step.ok shouldBe true
    // the audit column survives on matched rows, null on the rest
    result.files.filter(col("rel_path") === "example.txt")
      .select("backed_up").collect().head.getBoolean(0) shouldBe true
  }
}
