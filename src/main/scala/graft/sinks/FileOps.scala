package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Filesystem side-effects — SURVEY.md §2.9 K9, the reference's
  * backup/copy/rename/delete processors (`processors/file_ops.py:17-168`).
  * Implemented over the Hadoop FS client so the same calls work on
  * local disk, HDFS and object stores; these are pipeline-runner
  * effects, not relational operators.
  */
object FileOps {
  /** The one place the path→FileSystem resolution idiom lives (it
    * was inlined in four call sites; scheme/authority quirks must be
    * fixed once).
    */
  private[graft] def fileSystem(path: String, spark: SparkSession): FileSystem =
    // Hadoop Path, not java.net.URI: a raw local path with a space is
    // legal input here but an URISyntaxException for the URI parser
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
}

final class FileOps(spark: SparkSession) {

  private def fs(path: String): FileSystem = FileOps.fileSystem(path, spark)

  /** Copy preserving the path relative to `srcRoot` under `dstRoot`
    * (the reference's backup-with-relpath, `file_ops.py:17-78`).
    * Source and destination resolve their filesystems INDEPENDENTLY —
    * backing a local tree up to an object store is the normal cluster
    * use, and a single-FS copy would write to the wrong place.
    */
  def backup(srcRoot: String, relPath: String, dstRoot: String): Unit = {
    val sfs = fs(srcRoot)
    val dfs = fs(dstRoot)
    val src = new HPath(s"$srcRoot/$relPath")
    val dst = new HPath(s"$dstRoot/$relPath")
    dfs.mkdirs(dst.getParent)
    org.apache.hadoop.fs.FileUtil.copy(sfs, src, dfs, dst, false, true,
      spark.sparkContext.hadoopConfiguration)
  }

  /** Rename with a prefix (`file_ops.py:96-132`). */
  def renameWithPrefix(dir: String, name: String, prefix: String): Unit = {
    val f = fs(dir)
    f.rename(new HPath(s"$dir/$name"), new HPath(s"$dir/$prefix$name"))
  }

  def delete(path: String): Boolean =
    fs(path).delete(new HPath(path), false)

  def exists(path: String): Boolean =
    fs(path).exists(new HPath(path))
}
