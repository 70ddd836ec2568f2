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
}
