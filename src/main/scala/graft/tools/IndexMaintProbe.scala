package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the measured payoff of `LshIndex.compactFrames` — the
  * per-micro-batch cost of the streaming corpus-growth dedup loop
  * (load + incrementalPairs, which re-lists all three index frames)
  * as the per-append small-file debris accumulates, and what a
  * compaction restores. Feeds BASELINE.md §"Index file maintenance"
  * and the SURVEY §9 cadence rule.
  *
  * Protocol: build the index over the ScaleTrend docs fixture (same
  * generator/banding as the scale rows: 1/24/3), then fold in
  * `appends` marked batches of `batchSize` docs — each append writes
  * a fresh small parquet file set into base/banded/buckets, exactly
  * the streaming fold-in's layout trajectory. A PROBE batch (never
  * appended) is deduped against the index with a timed
  * load+incrementalPairs at three points: fresh build, after all
  * appends, after `compactFrames`. Each probe runs twice
  * back-to-back (cold, warm) — the warm number is the steady-state
  * micro-batch cost. File counts come from `Compaction.census`
  * (footer-verified, the same population `spark.read` lists).
  *
  * Usage: `IndexMaintProbe [n] [appends] [batchSize]` — defaults
  * 8000000, 100, 8000 (100 × 0.1% batches).
  */
object IndexMaintProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    val appends = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val batchSize = args.drop(2).headOption.map(_.toLong).getOrElse(8000L)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", out + "/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docsPath = ScaleTrend.docsFixture(spark, n, out)
    val docs = spark.read.parquet(docsPath)
    val corpusEnd = n - appends * batchSize - batchSize
    require(corpusEnd > 0, s"n=$n too small for $appends x $batchSize appends")
    val probeBatch = docs.filter(col("doc_id") >= n - batchSize)
    // fresh path per run: the probe MUTATES the index (appends +
    // compaction), so a cached fixture would not be a fresh build
    val idxPath = s"$out/maintidx_${n}_a${appends}_b${batchSize}"
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idxPath), true)

    def timed[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    def files(): String =
      Seq("base.parquet", "banded.parquet", "buckets.parquet").map { f =>
        val (nf, _, _, _) = graft.ops.Compaction.census(spark, s"$idxPath/$f")
        s"$f=$nf"
      }.mkString(" ")

    def probe(): Double = {
      val index = graft.ext.LshIndex.load(spark, idxPath)
      val (sec, _) = timed(
        graft.ext.LshIndex.incrementalPairs(index, probeBatch, "text",
          threshold = 0.9)._1.count())
      sec
    }

    println(s"n=$n appends=$appends batchSize=$batchSize corpusEnd=$corpusEnd")
    val (buildSec, _) = timed(graft.ext.LshIndex.build(spark, idxPath,
      docs.filter(col("doc_id") < corpusEnd), "text", "doc_id",
      ScaleTrend.LshShingleWidth, ScaleTrend.LshNumHashes,
      ScaleTrend.LshNumBands))
    println(f"build $buildSec%.1f s; files: ${files()}")
    println(f"probe after build: cold ${probe()}%.2f s, warm ${probe()}%.2f s")

    val appendSecs = (0 until appends).map { k =>
      val lo = corpusEnd + k * batchSize
      val (sec, _) = timed(graft.ext.LshIndex.append(spark, idxPath,
        docs.filter(col("doc_id") >= lo && col("doc_id") < lo + batchSize),
        "text", batchMarker = Some(k.toLong)))
      sec
    }
    println(f"appends: first10 ${appendSecs.take(10).sum / 10}%.2f s/ea, " +
      f"last10 ${appendSecs.takeRight(10).sum / 10}%.2f s/ea, " +
      f"total ${appendSecs.sum}%.1f s")
    println(s"files after $appends appends: ${files()}")
    println(f"probe after appends: cold ${probe()}%.2f s, warm ${probe()}%.2f s")

    val (compactSec, report) =
      timed(graft.ext.LshIndex.compactFrames(spark, idxPath))
    println(f"compactFrames $compactSec%.1f s; files: ${files()}; " +
      s"bucketRows ${report.bucketRowsBefore} -> ${report.bucketRowsAfter}")
    println(f"probe after compact: cold ${probe()}%.2f s, warm ${probe()}%.2f s")
    spark.stop()
  }
}
