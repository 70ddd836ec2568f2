package graft.pipeline

/** Retry semantics (`decorators/processor.py:316-357`): success
  * passthrough, exhaustion with structured error, exponential delays.
  */
class RetrySpec extends org.scalatest.funsuite.AnyFunSuite
    with org.scalatest.matchers.should.Matchers {

  test("first-try success records one attempt") {
    val o = Retry(sleep = _ => ())(42)
    o.result shouldBe Some(42)
    o.attempts shouldBe 1
    o.error shouldBe None
  }

  test("succeeds after transient failures") {
    var calls = 0
    val o = Retry(attempts = 3, sleep = _ => ()) {
      calls += 1
      if (calls < 3) throw new RuntimeException("flaky")
      "ok"
    }
    o.result shouldBe Some("ok")
    o.attempts shouldBe 3
  }

  test("exhaustion returns structured error and backed-off delays") {
    val delays = scala.collection.mutable.ListBuffer.empty[Long]
    val o = Retry[Int](attempts = 3, initialDelayMs = 100, backoff = 2.0,
      sleep = d => delays += d) { throw new IllegalStateException("down") }
    o.succeeded shouldBe false
    o.attempts shouldBe 3
    o.error.get should include("down")
    delays.toList shouldBe List(100L, 200L) // no sleep after the last try
  }

  test("registerWithRetry retries a flaky processor, fail-soft on exhaustion") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val files = Seq(("a/x.txt", 1)).toDF("rel_path", "v")
    val reg = new Registry
    var calls = 0
    reg.registerWithRetry("flaky", attempts = 3, sleep = _ => ()) { (df, _) =>
      calls += 1
      if (calls < 2) throw new RuntimeException("transient")
      df
    }
    var always = 0
    reg.registerWithRetry("dead", attempts = 2, sleep = _ => ()) { (_, _) =>
      always += 1; throw new RuntimeException("permanent")
    }
    val plan = PipelinePlan(Seq(
      Rule("**/*.txt", Phase.Inline, "flaky"),
      Rule("**/*.txt", Phase.Inline, "dead")))
    val res = new Runner(reg).run(files, plan)
    calls shouldBe 2   // one transient failure, then success
    always shouldBe 2  // exhausted both attempts
    res.steps.find(_.processor == "flaky").get.ok shouldBe true
    val deadStep = res.steps.find(_.processor == "dead").get
    deadStep.ok shouldBe false
    deadStep.error.get should include("after 2 attempts")
    res.files.count() shouldBe 1 // fail-soft: the run completed
  }
}
