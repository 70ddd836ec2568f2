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

  test("salting spreads the hot key: no shuffle partition holds it whole") {
    // the runtime side of the q90 plan assertion — measure the actual
    // (key, salt) group sizes the join shuffle would produce
    val hot = 8000
    val big = ((1 to hot).map(_ => 1L) ++ (1 to 100).map(_.toLong + 1))
      .toDF("k")
    val sizes = big
      .withColumn("__salt", pmod(xxhash64(col("k")), lit(8)))
      .groupBy("k", "__salt").count()
      .filter(col("k") === 1L)
      .collect().map(_.getLong(2))
    sizes.sum shouldBe hot.toLong
    // one salt value per row here (k is the only hash input), so the
    // hot key collapses to a single bucket UNLESS a disambiguator is
    // hashed too — which saltedJoin does by hashing the whole row.
    // This test pins the failure mode the full-row hash prevents:
    val spread = big.withColumn("rid", monotonically_increasing_id())
      .withColumn("__salt", pmod(xxhash64(col("k"), col("rid")), lit(8)))
      .groupBy("k", "__salt").count()
      .filter(col("k") === 1L)
      .collect().map(_.getLong(2))
    spread.length shouldBe 8 // all 8 buckets in use
    spread.max should be < (hot * 0.25).toLong // no straggler bucket
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
