package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool behind the round-11 streaming fixed-overhead question:
  * the five streaming gates (q39/q73/q84/q99/q104) cost ~14 s of the
  * ~98 s bench median, dominated by per-query stream machinery rather
  * than data volume. The prime suspect is state-store fan-out:
  * stateful micro-batches create one state store instance PER SHUFFLE
  * PARTITION, and each store commits a delta file per batch — at the
  * session default (32) that is 32 stores × ~3 micro-batches of tiny
  * HDFS-backed files per gate, pure fixed overhead at fixture scale.
  *
  * This times each streaming gate at several stream shuffle-partition
  * settings (aggregation VALUES are partition-count-invariant — the
  * gates' oracle parity is untouched; only state/shuffle fan-out
  * changes). The round-11 outcome of this measurement is that the
  * gates PIN their own production value (8) via
  * `EventStream.withShufflePartitions`, so the sweep drives the
  * `spark.graft.stream.partitions` OVERRIDE that helper honors —
  * setting the plain shuffle conf here would be silently ignored.
  * Each (gate, parts) runs twice on a warm JVM; both times print
  * (the first carries codegen/classload on the first gate of a
  * setting).
  *
  * Usage: `StreamProbe [parts,...] [queries,...]` (defaults
  * 32,8,4 and the five streaming gates). SPARK_GRAFT_SF_DIR picks the
  * fixture (default sf0.1, the bench scale).
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val partSettings = args.headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(32, 8, 4))
    val queries = args.drop(1).headOption
      .map(_.split(",").toSeq)
      .getOrElse(Seq("q39_stream_window", "q104_append_window",
        "q99_stream_kmv", "q73_stream_sessions", "q84_stream_dedup"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(f"${"query"}%-22s ${"parts"}%6s ${"run1"}%8s ${"run2"}%8s")
    queries.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      partSettings.foreach { p =>
        spark.conf.set(
          graft.streaming.EventStream.StreamPartitionsOverrideKey, p.toString)
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$q%-22s $p%6d ${times(0)}%8.2f ${times(1)}%8.2f")
      }
    }
    spark.stop()
  }
}
