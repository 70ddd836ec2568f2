package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness (driver contract): one JSON line with per-query
  * and total wall-clock seconds over `SparkEntry.queries`.
  *
  * Methodology (fixed after round 2 — see VERDICT r02 "What's wrong"):
  *  - queries run in DETERMINISTIC sorted-name order, so JVM/codegen
  *    warmup lands on the same queries every round and per-query
  *    deltas are comparable round-over-round;
  *  - one untimed WARMUP query absorbs first-action class-loading and
  *    codegen compilation;
  *  - the action is a `noop`-format write, which computes EVERY output
  *    column — `.count()` let Catalyst prune projections out of
  *    non-aggregate queries entirely (q14's string functions were
  *    never executed).
  *
  * Beside wall-clock, the run stamps per-gate executor TASK CPU
  * (listener-accumulated `executorCpuTime`, bracketed by a listener-bus
  * drain per gate) into the BENCH_LOCAL.json artifact as `"taskSec"` —
  * the host-window adjudication instrument for CPU-bound gates
  * (BENCH_VARIANCE §"Task-time adjudication"): wall moved but task-CPU
  * flat → host scheduling noise, no audit; both moved → code-attributable,
  * audit. The stdout lines stay wall-only — the driver's capture keeps a
  * byte-tail, and a second per-query map would push the wall map out of
  * its window.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // per-gate executor CPU: one additive listener for the whole run,
    // bracketed by a listener-bus drain before each read so every
    // finished task's metrics are in the counter (no sleep-and-hope)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) cpuNs.addAndGet(m.executorCpuTime)
        }
      })
    def cpuNow(): Long = {
      org.apache.spark.sql.graftbridge.Bridge
        .waitListenerBusEmpty(spark.sparkContext)
      cpuNs.get()
    }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // warmup: the first query in order, untimed (JVM + codegen spin-up).
    // NonFatal only — an OOM or interrupt here must kill the run, not
    // silently skew every timing that follows.
    ordered.headOption.foreach { case (_, fn) =>
      try run(fn) catch { case scala.util.control.NonFatal(_) => () }
    }
    val results = ordered.map { case (name, fn) =>
      val c0 = cpuNow()
      val t0 = System.nanoTime()
      try run(fn) catch { case scala.util.control.NonFatal(_) => () }
      val wall = (System.nanoTime() - t0) / 1e9
      val task = (cpuNow() - c0) / 1e9
      (name, wall, task)
    }
    // millisecond precision: full-precision doubles made the JSON line
    // long enough that the driver's capture truncated its head (r05's
    // BENCH file lost 9 queries and failed to parse) — 3 decimals is
    // ample for per-query seconds and keeps the whole line in-window
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val ts = results.map { case (k, _, t) => s"\"" + k + "\":" + r3(t) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val taskTotal = results.map(_._3).sum
    val json =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The driver's stdout capture window keeps the LAST bytes. The full
    // per-query line now carries 100+ timings, so its HEAD can fall out
    // of the window (r05 lost 9 queries, r06 lost 8, r07/r08 failed to
    // parse). Fix at the source: after the full line, print a SHORT
    // total-only summary line LAST — whatever the window cuts, the tail
    // always ends with one complete parseable JSON object.
    // "kind":"summary" discriminates this line from the full per-query
    // line above (both carry "metric":"total") so a consumer scanning
    // for total-metric lines can't double-count.
    val summary =
      s"""{"metric":"total","kind":"summary","value":${r3(total)},"unit":"sec","task_total":${r3(taskTotal)},"sf":"$sfDir"}"""
    // stop FIRST so Spark's shutdown logging lands before the JSON
    spark.stop()
    println(json)
    println(summary)
    // belt-and-braces: the FULL json (wall + per-gate task CPU) as a
    // working-dir artifact, so per-query data survives any capture
    // truncation. Best-effort and AFTER the printlns — a failed write
    // must not cost the stdout lines
    try {
      val full =
        s"""{"metric":"total","value":${r3(total)},"unit":"sec","task_total":${r3(taskTotal)},"queries":$qs,"taskSec":$ts,"sf":"$sfDir"}"""
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
      java.nio.file.Files.write(out,
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}
