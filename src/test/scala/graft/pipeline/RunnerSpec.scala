package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors the reference's engine tests (`test/test_validate.py:26-67`):
  * rule matching, phase ordering, priority (descending, duplicates
  * kept), fail-soft error isolation, step log.
  */
class RunnerSpec extends SparkSpec {
  import spark.implicits._

  private def files = Seq(
    ("a/x.txt", 3), ("a/y.csv", 5), ("b/z.txt", 7)
  ).toDF("rel_path", "v")

  test("inline rules transform only matching rows; others pass through") {
    val reg = new Registry
    reg.register("double_v") { (df, _) => df.withColumn("v", col("v") * 2) }
    val plan = PipelinePlan(Seq(Rule("**/*.txt", Phase.Inline, "double_v")))
    val out = new Runner(reg).run(files, plan).files
    out.orderBy("rel_path").select("v").as[Int].collect() shouldBe Array(6, 5, 14)
  }

  test("priority orders execution descending; duplicates run twice") {
    val reg = new Registry
    reg.register("add1") { (df, _) => df.withColumn("v", col("v") + 1) }
    reg.register("times10") { (df, _) => df.withColumn("v", col("v") * 10) }
    val plan = PipelinePlan(Seq(
      Rule("**", Phase.Inline, "add1", priority = 1),
      Rule("**", Phase.Inline, "times10", priority = 5),
      Rule("**", Phase.Inline, "add1", priority = 1)))
    val out = new Runner(reg).run(files, plan).files
    // times10 first (prio 5), then add1 twice: v*10 + 2
    out.orderBy("rel_path").select("v").as[Int].collect() shouldBe
      Array(32, 52, 72)
  }

  test("post processors consume the transformed frame") {
    val reg = new Registry
    reg.register("double_v") { (df, _) => df.withColumn("v", col("v") * 2) }
    reg.register("sum_by_dir", kind = "post") { (df, _) =>
      df.withColumn("dir", split(col("rel_path"), "/")(0))
        .groupBy("dir").agg(sum("v").as("total")) }
    val plan = PipelinePlan(Seq(
      Rule("**/*.txt", Phase.Inline, "double_v"),
      Rule("**", Phase.Post, "sum_by_dir")))
    val res = new Runner(reg).run(files, plan)
    res.postResults("sum_by_dir").orderBy("dir")
      .select("total").as[Long].collect() shouldBe Array(11L, 14L)
  }

  test("fail-soft: a throwing processor logs an error step, run continues") {
    val reg = new Registry
    reg.register("boom") { (_, _) => throw new RuntimeException("kaput") }
    reg.register("add1") { (df, _) => df.withColumn("v", col("v") + 1) }
    val plan = PipelinePlan(Seq(
      Rule("**", Phase.Inline, "boom", priority = 9),
      Rule("**", Phase.Inline, "add1")))
    val res = new Runner(reg).run(files, plan)
    res.files.agg(sum("v")).as[Long].collect().head shouldBe 18L
    res.steps.map(s => (s.processor, s.ok)) shouldBe
      Seq(("boom", false), ("add1", true))
    res.steps.head.error.get should include("kaput")
  }

  test("parseConfig builds the plan IR from rule lines") {
    val plan = PipelinePlan.parseConfig(Seq(
      "# pipeline config",
      "rule pattern=**/*.txt phase=inline processor=word_count priority=5 cfg.mode=fast",
      "",
      "rule pattern=** phase=post processor=dir_stats",
      "rule pattern=** phase=post processor=dir_stats" // duplicate kept
    ))
    plan.rules should have size 3
    plan.rules.head shouldBe Rule("**/*.txt", Phase.Inline, "word_count", 5,
      Map("mode" -> "fast"))
    plan.forPhase(Phase.Post) should have size 2
    an[IllegalArgumentException] should be thrownBy
      PipelinePlan.parseConfig(Seq("rule pattern=x phase=bogus processor=p"))
    an[IllegalArgumentException] should be thrownBy
      PipelinePlan.parseConfig(Seq("frobnicate all-the-things"))
  }

  test("describe lists steps in phase+priority order without executing") {
    val plan = PipelinePlan(Seq(
      Rule("**", Phase.Post, "c"),
      Rule("**", Phase.Inline, "b", priority = 2),
      Rule("**", Phase.Pre, "a")))
    plan.describe shouldBe Seq(
      "Pre ** -> a (prio=0)",
      "Inline ** -> b (prio=2)",
      "Post ** -> c (prio=0)")
  }
}
