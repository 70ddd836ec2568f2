package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The streaming gates' FIXED floor, measured once so bench-drift
  * adjudication becomes mechanical subtraction (round-16 verdict ask:
  * every host-window discussion kept re-litigating q110/q115/q99,
  * whose wall-clock is mostly Structured Streaming machinery, not
  * dataflow). Protocol: k one-row parquet files streamed with
  * `maxFilesPerTrigger = 1` into a NOOP `foreachBatch` under
  * `Trigger.AvailableNow()` — i.e. exactly the gates' stream shape
  * with zero per-batch work — timed start→awaitTermination, 3 runs
  * per k taking the minimum. The k-batch floor is the number to
  * subtract from a streaming gate's stamp before comparing rounds;
  * the remainder is the gate's actual dataflow.
  *
  * Usage: `StreamFloorProbe [ks]` (comma list, default `1,2,4,8`).
  * Feeds BENCH_VARIANCE §"Streaming fixed floor".
  */
object StreamFloorProbe {

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 2, 4, 8))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timedRun(k: Int): Double = {
      val root = java.nio.file.Files
        .createTempDirectory("graft_streamfloor_").toString
      val batchDir = s"$root/batches"
      (0 until k).foreach { i =>
        Seq((i.toLong, s"row$i")).toDF("id", "text")
          .coalesce(1).write.mode("append").parquet(batchDir)
      }
      val t0 = System.nanoTime()
      val q = spark.readStream
        .schema(spark.read.parquet(batchDir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(batchDir)
        .writeStream
        .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      sec
    }

    // one throwaway run absorbs first-stream JVM warmup (state store
    // provider init, codegen of the file-source path)
    timedRun(1)
    ks.foreach { k =>
      val best = (1 to 3).map(_ => timedRun(k)).min
      println(f"streaming floor: batches=$k%2d noop-stream=$best%5.2f s")
    }
    spark.stop()
  }
}
