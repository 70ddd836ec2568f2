package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Parquet layout maintenance (✚ — the production face of
  * `tools/Relayout`'s measured lesson): parquet row groups are
  * Spark's split atoms, so a table written as few huge single-group
  * files scans on one task per file no matter how many cores exist,
  * and a table written as millions of tiny files drowns the scheduler
  * and the file index in per-file overhead. Real 100 TB tables drift
  * into BOTH states as streaming appends and small batch writes
  * accumulate — a compactor that rewrites a directory to a target
  * file size and a target row-group size is standing maintenance, the
  * operator every lakehouse runs nightly.
  *
  * Scale design: ONE distributed read → write pass. File count is
  * computed from actual on-disk bytes / `targetFileBytes`;
  * `coalesce` (default) collapses read tasks into the writers with NO
  * shuffle — the right shape for the common many-small-files case.
  * `shuffle = true` opts into a `repartition` for the two layouts
  * coalesce cannot fix: skew so bad that task-merging would produce
  * lopsided files, and the SPLITTING direction (fewer huge
  * single-row-group files into more well-sized ones — coalesce can
  * only merge partitions, never multiply them). Row-group size rides
  * the writer's
  * `parquet.block.size` flush threshold (approximate by design — the
  * writer checks buffered size periodically and compression changes
  * the ratio; the report reads the ACTUAL footer counts back).
  *
  * Hive-partitioned tables compact per leaf directory: map this over
  * the partition dirs (the partition columns live in the directory
  * names, not the files, so compacting a leaf never touches them).
  */
object Compaction {

  /** What a compaction did — actual footer-verified numbers, not
    * targets: file and row-group counts before/after, and the row
    * counts whose equality is the rewrite's safety check.
    */
  final case class Report(srcPath: String, dstPath: String,
                          filesBefore: Int, filesAfter: Int,
                          rowGroupsBefore: Long, rowGroupsAfter: Long,
                          rowsBefore: Long, rowsAfter: Long,
                          bytesBefore: Long, bytesAfter: Long) {
    require(rowsBefore == rowsAfter,
      s"Compaction lost rows: $rowsBefore before, $rowsAfter after " +
        s"($srcPath -> $dstPath) — the destination is NOT safe to swap in")
  }

  /** Footer census of a parquet directory: (files, rowGroups, rows,
    * bytes). Footer reads are metadata-only — no data pages move.
    *
    * File selection matches what `spark.read.parquet(dir)` will read —
    * every visible file, regardless of extension (Hive/Impala-style
    * part files are extension-less), skipping exactly what Spark's
    * listing filter (`HadoopFSUtils.shouldFilterOut`) skips: dotfiles,
    * in-flight `*._COPYING_` copies, and `_`-prefixed sidecars
    * (`_SUCCESS`, `_metadata`) UNLESS the name contains `=` (Spark
    * admits those as partition-valued names). Counting a different
    * population than the read would make the before/after row-parity
    * check compare apples to oranges; a non-parquet stray that Spark
    * WOULD read fails the footer read here — the same file the data
    * read would die on, surfaced early, before any rewrite work.
    */
  def census(spark: SparkSession, dir: String): (Int, Long, Long, Long) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root)
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith(".") && !n.endsWith("._COPYING_") &&
          !(n.startsWith("_") && !n.contains("="))
      }
    var groups = 0L
    var rows = 0L
    var bytes = 0L
    files.foreach { st =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(st.getPath, conf))
      try {
        groups += reader.getRowGroups.size
        rows += reader.getRecordCount
      } finally reader.close()
      bytes += st.getLen
    }
    (files.length, groups, rows, bytes)
  }

  /** Rewrite the parquet files under `srcPath` into `dstPath` with
    * ~`targetFileBytes` per file and ~`targetRowGroupBytes` per row
    * group. Returns the footer-verified [[Report]]; throws (without
    * having touched `srcPath`) if the rewrite lost rows. The source is
    * left intact — swapping the compacted directory in (and retiring
    * the old one) is the caller's transactional step, on whatever
    * commit protocol the surrounding table format provides.
    */
  def compactTo(spark: SparkSession, srcPath: String, dstPath: String,
                targetFileBytes: Long = 512L * 1024 * 1024,
                targetRowGroupBytes: Long = 128L * 1024 * 1024,
                shuffle: Boolean = false): Report = {
    require(targetFileBytes > 0 && targetRowGroupBytes > 0,
      s"Compaction targets must be positive: file=$targetFileBytes " +
        s"rowGroup=$targetRowGroupBytes")
    val (filesBefore, groupsBefore, rowsBefore, bytesBefore) =
      census(spark, srcPath)
    require(filesBefore > 0, s"Compaction.compactTo: no parquet files under $srcPath")
    val numFiles = math.max(1L,
      (bytesBefore + targetFileBytes - 1) / targetFileBytes).toInt
    val src = spark.read.parquet(srcPath)
    val sized = if (shuffle) src.repartition(numFiles) else src.coalesce(numFiles)
    sized.write.mode("overwrite")
      .option("parquet.block.size", targetRowGroupBytes.toString)
      .parquet(dstPath)
    val (filesAfter, groupsAfter, rowsAfter, bytesAfter) =
      census(spark, dstPath)
    Report(srcPath, dstPath, filesBefore, filesAfter, groupsBefore,
      groupsAfter, rowsBefore, rowsAfter, bytesBefore, bytesAfter)
  }
}
