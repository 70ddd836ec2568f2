package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool behind the compactTree parallelism default: q106 gates a
  * 2-leaf fixture, and the runbook (SURVEY §9) prescribes "bounded
  * parallelism" with no measured price — this measures a ~256-leaf
  * fragmented tree (the small-files shape compaction exists for: a
  * long-running ingest leaving dozens of tiny files per Hive leaf)
  * under a parallelism sweep, plus the footer-verify overhead
  * (compactTo runs a metadata-only census BEFORE and AFTER each leaf's
  * rewrite — that's 2 × leaves × files footer reads, priced here
  * separately so the verify contract's cost is a number, not a vibe).
  *
  * Fixture: 256 leaves (`p=0..255`), ~24 small files each (~6 k files
  * total), cached under SPARK_GRAFT_SCALE_DIR with the ScaleTrend
  * version-token discipline. Each sweep point compacts to a fresh
  * dstRoot (deleted after timing); per-leaf job scheduling is
  * concurrent Spark jobs from a bounded pool, so the sweep prices
  * exactly the knob compactTree exposes.
  *
  * Usage: `CompactProbe [parallelisms] [leaves] [rowsPerLeaf]`
  * (defaults 1,4,16 / 256 / 100000).
  */
object CompactProbe {

  private[tools] val TreeGenVersion = "t1"

  /** ~24 visible files per leaf: rows are hash-repartitioned on
    * (p, subfile) so each shuffle task holds ~one (p, subfile) group
    * and the partitionBy write emits ~one file per group.
    */
  private def buildTree(spark: SparkSession, path: String,
                        leaves: Int, rowsPerLeaf: Long): Unit = {
    val subfiles = 24
    spark.range(leaves * rowsPerLeaf).select(
        pmod(col("id"), lit(leaves.toLong)).as("p"),
        col("id"),
        md5(col("id").cast("string")).as("payload"))
      .withColumn("subfile", pmod(xxhash64(col("id")), lit(subfiles.toLong)))
      .repartition(leaves * subfiles, col("p"), col("subfile"))
      .drop("subfile")
      .write.mode("overwrite").partitionBy("p").parquet(path)
  }

  private[tools] def treeFixture(spark: SparkSession, leaves: Int,
                                 rowsPerLeaf: Long, out: String): String = {
    val path = s"$out/ctree_${leaves}_${rowsPerLeaf}_$TreeGenVersion"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      buildTree(spark, path, leaves, rowsPerLeaf)
      // partitionBy writes no top-level _SUCCESS marker under some
      // committers; stamp our own completion marker for the cache check
      val f = new java.io.File(path + "/_SUCCESS")
      if (!f.exists()) f.createNewFile()
    }
    path
  }

  def main(args: Array[String]): Unit = {
    val parSweep = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 4, 16))
    val leaves = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val rowsPerLeaf = args.drop(2).headOption.map(_.toLong).getOrElse(100000L)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", out + "/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val src = treeFixture(spark, leaves, rowsPerLeaf, out)
    val leafList = graft.ops.Compaction.leafDirs(spark, src)
    println(s"fixture: $src  leaves=${leafList.size}  rowsPerLeaf=$rowsPerLeaf")

    // footer-verify price, isolated: one census pass over every leaf is
    // exactly the metadata work compactTo adds per side (before/after)
    val tCensus0 = System.nanoTime()
    val censusTotals = leafList.map { rel =>
      graft.ops.Compaction.census(spark, s"$src/$rel")
    }
    val censusSec = (System.nanoTime() - tCensus0) / 1e9
    val filesTotal = censusTotals.map(_._1.toLong).sum
    println(f"census-only pass: $censusSec%.1f s for $filesTotal files " +
      f"(${censusSec / leafList.size * 1000}%.0f ms/leaf) — compactTree pays ~2x this")

    parSweep.foreach { p =>
      val dst = s"$out/ctree_out_$p"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dst))
      val t0 = System.nanoTime()
      val reports = graft.ops.Compaction.compactTree(spark, src, dst,
        parallelism = p)
      val sec = (System.nanoTime() - t0) / 1e9
      val filesAfter = reports.map(_._2.filesAfter.toLong).sum
      println(f"parallelism=$p%-3d  wall=$sec%7.1f s  " +
        f"(${sec / reports.size * 1000}%.0f ms/leaf)  " +
        f"files ${filesTotal} -> ${filesAfter}")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dst))
    }
    spark.stop()
  }
}
