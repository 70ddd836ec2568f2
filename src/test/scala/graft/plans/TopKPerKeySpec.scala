package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Custom top-k-per-key operator: must equal the window-function
  * formulation exactly, and must plan as partial exec → exchange →
  * final exec (map-side top-k before the shuffle).
  */
class TopKPerKeySpec extends SparkSpec {

  private lazy val events = Tables(spark, sf, "events")
    .select(col("user_id"), col("event_id"), col("value"))

  test("equals the window row_number formulation") {
    val custom = TopK.topKPerKey(events, Seq("user_id"), "value", k = 3,
        desc = true, tiebreak = Seq("event_id"))
      .select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    val expected = events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    custom shouldBe expected
    custom.size should be > 3
  }

  test("plans as partial + exchange + final") {
    val df = TopK.topKPerKey(events, Seq("user_id"), "value", k = 2)
    // SparkPlan.nodeName strips the 'Exec' suffix in plan strings
    val plan = df.queryExecution.executedPlan.toString
    plan.sliding("TopKPerKey".length).count(_ == "TopKPerKey") shouldBe 2
    plan should include("Exchange hashpartitioning(user_id")
  }

  test("k larger than group size returns whole groups") {
    val out = TopK.topKPerKey(events.filter(col("user_id") < 3),
      Seq("user_id"), "value", k = 1000000)
    out.count() shouldBe events.filter(col("user_id") < 3).count()
  }

  test("partial-state key cap: overflow keys pass through, results " +
    "stay exact at key cardinality past MaxPartialKeys") {
    import spark.implicits._
    // > 2^17 distinct keys through ONE partial partition, 3 rows per
    // key — tracked keys reduce map-side, the ~69 k overflow keys
    // pass through; the final pass must still produce the exact
    // per-key top-2 (found by the 8 M-doc keywords trend OOM: the
    // partial heap map was unbounded in key count)
    val n = TopKPerKeyExec.MaxPartialKeys + 70000
    val rows = spark.range(n.toLong * 3).select(
      (col("id") % n).as("key"),
      (col("id") / n).as("seq"),
      pmod(col("id") * 2654435761L, lit(1000003L)).as("value"))
      .repartition(1)
    val got = TopK.topKPerKey(rows, Seq("key"), "value", k = 2,
        desc = true, tiebreak = Seq("seq"))
    got.count() shouldBe n.toLong * 2
    // spot-exactness on a sample of keys incl. past the cap
    val sample = got.filter(col("key").isin(0L, 1L,
        TopKPerKeyExec.MaxPartialKeys.toLong + 1, n.toLong - 1))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val w = Window.partitionBy(col("key"))
      .orderBy(col("value").desc, col("seq"))
    val expected = rows.filter(col("key").isin(0L, 1L,
        TopKPerKeyExec.MaxPartialKeys.toLong + 1, n.toLong - 1))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    sample shouldBe expected
  }

  test("ascending order with tiebreak") {
    val custom = TopK.topKPerKey(events, Seq("user_id"), "value", k = 1,
        desc = false, tiebreak = Seq("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").asc, col("event_id"))
    val expected = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    custom shouldBe expected
  }
}
