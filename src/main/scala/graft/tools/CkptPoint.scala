package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the fault-tolerance tax of
  * [[graft.ext.CheckpointMode.Reliable]] on the big iterative point:
  * componentsStar over ScaleTrend's adversarial path graph (the q91
  * shape — O(log n) contraction rounds, a checkpoint per round).
  * Local mode keeps per-round state in executor-local blocks (lost
  * with an executor); Reliable writes each round to a fault-tolerant
  * checkpoint directory. The delta prices what a production cluster
  * pays for surviving executor loss mid-contraction.
  *
  * Usage: `CkptPoint [n] [rounds]` (defaults 8000000, 2 measured runs
  * per mode). The mode ORDER flips each round (Local/Reliable, then
  * Reliable/Local) so neither mode systematically absorbs the cold
  * JVM's first run or within-pair page-cache warmup; each Reliable
  * run's checkpoint directory is deleted after its count (the final
  * round's files otherwise outlive the run — `Checkpointing` frees
  * only superseded rounds — and would accumulate GBs on the shared
  * scale volume).
  */
object CkptPoint {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    val runsPerMode = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", out + "/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (nodes, edges) = ScaleTrend.chain(spark, n)

    def run(mode: graft.ext.CheckpointMode): Double = {
      val t0 = System.nanoTime()
      graft.ext.DupClusters.componentsStar(edges, nodes, maxIter = 60,
        mode = mode).count()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"${"mode"}%-10s ${"run"}%4s ${"sec"}%8s")
    (1 to runsPerMode).foreach { i =>
      val ckptDir = s"$out/ckpt_point_$i"
      val pair = Seq(
        "local" -> graft.ext.CheckpointMode.Local,
        "reliable" -> graft.ext.CheckpointMode.Reliable(ckptDir))
      val ordered = if (i % 2 == 1) pair else pair.reverse
      ordered.foreach { case (label, mode) =>
        val sec = run(mode)
        println(f"$label%-10s $i%4d $sec%8.1f")
      }
      val p = new org.apache.hadoop.fs.Path(ckptDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    spark.stop()
  }
}
