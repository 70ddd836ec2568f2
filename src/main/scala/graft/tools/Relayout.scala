package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Fixture re-layout: rewrite each sf table into a single parquet file
  * with ~`rowGroups` row groups instead of one.
  *
  * Why this exists: parquet row groups are Spark's split atoms — a
  * scan task reads every row group whose midpoint lands in its byte
  * range, so a 600 k-row table written as ONE row group is a ONE-task
  * scan no matter how many cores the cluster has. The driver-generated
  * fixtures are single-row-group files, which flattens every q1-class
  * scan to a single core (the "fixture floor" documented in
  * BASELINE.md). At 100 TB nobody writes such files — this tool
  * produces the realistic layout so the bench can measure the same
  * queries against it (BASELINE.md "row-group relayout" table).
  *
  * `parquet.block.size` is the writer's row-group flush threshold, so
  * target size = file bytes / rowGroups gives ≈ rowGroups groups per
  * file (approximate: the writer checks buffered size periodically and
  * compression changes the ratio — the footer count is printed so the
  * real number is visible).
  *
  * Usage: Relayout [srcSfDir] [dstDir] [rowGroups]
  */
object Relayout {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_relayout_sf0.1")
    val rowGroups = args.lift(2).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // raw byte-shuffling of the fixture: events.ts NANOS stays a long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = spark.sparkContext.hadoopConfiguration
    val dstFs = new Path(dst).getFileSystem(conf)
    dstFs.mkdirs(new Path(dst))

    graft.Tables.names.foreach { name =>
      val srcPath = new Path(s"$src/$name.parquet")
      val fs = srcPath.getFileSystem(conf)
      if (!fs.exists(srcPath)) println(s"[relayout] $name: missing, skipped")
      else {
        val bytes = fs.getContentSummary(srcPath).getLength
        val blockSize = math.max(128L * 1024, bytes / rowGroups)
        val tmp = new Path(s"$dst/_tmp_$name")
        spark.read.parquet(srcPath.toString)
          .coalesce(1)
          .write.mode("overwrite")
          .option("parquet.block.size", blockSize.toString)
          .parquet(tmp.toString)
        val part = dstFs.listStatus(tmp)
          .map(_.getPath).find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file written for $name"))
        val out = new Path(s"$dst/$name.parquet")
        dstFs.delete(out, false)
        dstFs.rename(part, out)
        dstFs.delete(tmp, true)
        // read the footer back: the ACTUAL row-group count, not the target
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(out, conf))
        val (nGroups, nRows) =
          try (reader.getRowGroups.size, reader.getRecordCount)
          finally reader.close()
        println(s"[relayout] $name: $nRows rows, $nGroups row groups " +
          s"(target $rowGroups, block ${blockSize / 1024} KiB)")
      }
    }
    spark.stop()
  }
}
