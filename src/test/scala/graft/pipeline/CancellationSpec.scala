package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

/** Cooperative cancellation (`core/engine.py:82-85,127,360-361` parity):
  * the between-step check stops scheduling rules, and the job group
  * kills an in-flight distributed job.
  */
class CancellationSpec extends SparkSpec {
  import spark.implicits._

  private def files = Seq(
    ("a/x.txt", 3), ("a/y.csv", 5), ("b/z.txt", 7)
  ).toDF("rel_path", "v")

  test("cancel between steps: later rules never run, log records it") {
    val token = CancelToken(spark)
    val ran = scala.collection.mutable.ListBuffer.empty[String]
    val reg = new Registry
    reg.register("first") { (df, _) =>
      ran += "first"
      token.cancel() // a listener/watchdog would do this from another thread
      df
    }
    reg.register("second") { (df, _) => ran += "second"; df }
    reg.register("post_stats", kind = "post") { (df, _) =>
      ran += "post"; df.groupBy().count()
    }
    val plan = PipelinePlan(Seq(
      Rule("**", Phase.Inline, "first", priority = 10),
      Rule("**", Phase.Inline, "second", priority = 5),
      Rule("**", Phase.Post, "post_stats")))

    val res = new Runner(reg).run(files, plan, cancel = Some(token))
    ran.toList shouldBe List("first")
    res.postResults shouldBe empty
    res.steps.last.error shouldBe Some("cancelled")
    // the work done BEFORE the cancel is preserved (reference returns
    // the partial context, engine.py:128)
    res.files.count() shouldBe 3
  }

  test("no token → behavior unchanged") {
    val reg = new Registry
    reg.register("double_v") { (df, _) => df.withColumn("v", col("v") * 2) }
    val plan = PipelinePlan(Seq(Rule("**/*.txt", Phase.Inline, "double_v")))
    val out = new Runner(reg).run(files, plan).files
    out.orderBy("rel_path").select("v").as[Int].collect() shouldBe Array(6, 5, 14)
  }

  test("status log tracks the current step and lands in the file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_status_")
    val log = new StatusLog(Some(dir)) // directory → status.log inside it
    val seen = scala.collection.mutable.ListBuffer.empty[String]
    val reg = new Registry
    reg.register("p1") { (df, _) => seen += log.currentStatus.get; df }
    reg.register("stats", kind = "post") { (df, _) =>
      seen += log.currentStatus.get; df.groupBy().count()
    }
    val plan = PipelinePlan(Seq(
      Rule("**", Phase.Inline, "p1"),
      Rule("**", Phase.Post, "stats")))
    new Runner(reg).run(files, plan, status = Some(log))
    seen.toList shouldBe List("Inline ** -> p1", "Post ** -> stats")
    log.currentStatus shouldBe Some("done")
    val lines = java.nio.file.Files.readAllLines(dir.resolve("status.log"))
    lines.size shouldBe 3
    lines.get(2) should endWith("done")
  }

  test("simulate dry-runs the rule plan without executing processors") {
    val reg = new Registry
    var executed = false
    reg.register("touch") { (df, _) => executed = true; df }
    val plan = PipelinePlan(Seq(
      Rule("**/*.txt", Phase.Inline, "touch", priority = 5),
      Rule("a/*", Phase.Inline, "touch", priority = 9),
      Rule("**", Phase.Post, "stats")))
    val sim = new Runner(reg).simulate(files, plan).collect()
    executed shouldBe false
    // a/x.txt matches all three rules; priority orders inline steps
    val ax = sim.filter(_.getString(0) == "a/x.txt")
    ax.map(r => (r.getString(1), r.getString(2))).toSeq shouldBe Seq(
      ("Inline", "a/*"), ("Inline", "**/*.txt"), ("Post", "**"))
    // pattern filter + cap
    new Runner(reg).simulate(files, plan, patternFilter = Some("b/"))
      .select("path").distinct().collect().map(_.getString(0)).toSeq shouldBe
      Seq("b/z.txt")
    new Runner(reg).simulate(files, plan, maxItems = Some(2)).count() shouldBe 2
  }

  test("cancel kills an in-flight Spark job via the job group") {
    val token = CancelToken(spark)
    val slow = spark.range(0, 400, 1, 4).as[Long].map { i =>
      Thread.sleep(50); i // ~5 s/partition if left to finish
    }
    val t0 = System.nanoTime()
    val job = Future(token.withJobGroup("slow job")(slow.reduce(_ + _)))
    Thread.sleep(500) // let tasks start
    token.cancel()
    an[Exception] should be thrownBy Await.result(job, 30.seconds)
    val elapsed = (System.nanoTime() - t0) / 1e9
    // full job would take ~5 s; cancellation must cut it well short
    elapsed should be < 4.0
    token.isCancelled shouldBe true
  }
}
