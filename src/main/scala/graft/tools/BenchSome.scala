package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries with Bench's noop-write action —
  * `run_class.sh graft.tools.BenchSome q56_repetition ...` (sf dir via
  * SPARK_GRAFT_SF_DIR, default sf0.1; one untimed warmup per query).
  *
  * SPARK_GRAFT_MPB overrides `spark.sql.files.maxPartitionBytes` — at
  * fixture scale every table is far below the 128 MB default, so scan
  * parallelism is invisible without lowering the split size; used by
  * the BASELINE.md row-group-relayout measurement to map row groups to
  * tasks the way >128 MB files do naturally at production scale.
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = graft.SessionTuning.tuned(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC"))
    sys.env.get("SPARK_GRAFT_MPB").foreach(v =>
      builder.config("spark.sql.files.maxPartitionBytes", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      // label every job with its gate (guide §1.5) so event-log
      // profiling attributes driver/job time per gate
      spark.sparkContext.setJobDescription(q)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"$q%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
