package graft.pipeline

import graft.SparkSpec
import graft.sinks.PlotData
import org.apache.spark.sql.functions._

/** Progress listener (§3.2 GUI events → SparkListener) and the K7
  * per-series plot-data extraction.
  */
class ProgressSpec extends SparkSpec {
  import spark.implicits._

  test("listener observes jobs/stages/tasks of an action") {
    val p = new Progress(spark)
    try {
      spark.range(1000).select(sum("id")).collect()
      // listener bus is async; poll briefly for the events to land
      var s = p.snapshot
      val deadline = System.nanoTime() + 10e9.toLong
      while ((s.jobsEnded < 1 || s.stagesCompleted < 1) &&
             System.nanoTime() < deadline) {
        Thread.sleep(50); s = p.snapshot
      }
      s.jobsStarted should be >= 1
      s.jobsEnded shouldBe s.jobsStarted
      s.stagesCompleted should be >= 1
      s.tasksCompleted should be >= 1L
    } finally p.detach()
  }

  test("plot series extract to long form with filters applied") {
    val df = Seq((1, 1.0, "a"), (2, 4.0, "a"), (3, 9.0, "b"))
      .toDF("x", "y", "grp")
    val out = PlotData.extract(df, Seq(
      PlotData.SeriesSpec("A", col("grp") === "a", col("x"), col("y")),
      PlotData.SeriesSpec("B", col("grp") === "b", col("x"), col("y") * 2)))
    out.orderBy("series", "x").collect().map(_.toSeq) shouldBe Array(
      Seq("A", 1, 1.0), Seq("A", 2, 4.0), Seq("B", 3, 18.0))
    PlotData.points(df, PlotData.SeriesSpec("A", col("grp") === "a",
      col("x"), col("y"))).sortBy(_._1) shouldBe Array((1.0, 1.0), (2.0, 4.0))
  }
}
