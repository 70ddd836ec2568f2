package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-join machinery: bucketed co-located joins must plan with no
  * shuffle Exchange; salted joins must return exactly the plain-join
  * result.
  */
class ScaleJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans without a shuffle exchange") {
    val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 100).map(i => (i.toLong, i * 1.5)).toDF("k", "vb")
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    Bucketing.writeBucketed(a, "bkt_a", 4, Seq("k"))
    Bucketing.writeBucketed(b, "bkt_b", 4, Seq("k"))
    val joined = Bucketing.bucketedJoin(spark, "bkt_a", "bkt_b", Seq("k"))
    joined.count() shouldBe 100
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: SMJ reads both bucketed layouts directly
    plan should not include "Exchange hashpartitioning"
    spark.sql("DROP TABLE bkt_a")
    spark.sql("DROP TABLE bkt_b")
  }

  test("salted join equals the plain join under heavy key skew") {
    // 9000 rows on one key + tail: the canonical skew shape
    val big = ((1 to 9000).map(_ => (1L, "hot")) ++
      (1 to 100).map(i => (i.toLong + 1, "cold"))).toDF("k", "side")
    val small = (1 to 200).map(i => (i.toLong, s"dim$i")).toDF("k", "label")
    val plain = big.join(small, Seq("k"))
      .groupBy("k", "label").count()
    val salted = Salting.saltedJoin(big, small, "k", buckets = 8)
      .groupBy("k", "label").count()
    val p = plain.orderBy("k").collect().map(_.toSeq)
    val s = salted.orderBy("k").collect().map(_.toSeq)
    s shouldBe p
  }
}
