package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def itemsDf(items: Seq[String]) = items.toDF("item")

  test("estimate never underestimates and is exact without collisions") {
    // width 64 with 3 distinct items — collisions vanishingly unlikely
    // across all 3 lanes simultaneously; estimates equal exact counts
    val items = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val sk = CountMin.build(itemsDf(items), "item", width = 64, depth = 3)
    sk.total shouldBe 9L
    sk.estimateOf("alpha") shouldBe 5L
    sk.estimateOf("beta") shouldBe 3L
    sk.estimateOf("gamma") shouldBe 1L
    // an absent item can only read collision mass, never negative
    sk.estimateOf("absent") should be >= 0L
  }

  test("column estimate equals the JVM-side estimateOf") {
    val items = (1 to 50).flatMap(i => Seq.fill(i % 7 + 1)(s"w$i"))
    val sk = CountMin.build(itemsDf(items), "item", width = 64, depth = 3)
    val viaCol = itemsDf(items.distinct)
      .select(col("item"), CountMin.estimate(sk)(col("item")).as("e"))
      .as[(String, Long)].collect().toMap
    items.distinct.foreach { it =>
      viaCol(it) shouldBe sk.estimateOf(it)
    }
  }

  test("collisions overestimate deterministically; min over lanes " +
    "tightens the bound") {
    // width 64 (the minimum) with 500 distinct items — heavy collision
    // mass; every estimate must still be >= the true count
    val items = (1 to 500).map(i => s"k$i")
    val sk = CountMin.build(itemsDf(items), "item", width = 64, depth = 3)
    val ests = itemsDf(items)
      .select(CountMin.estimate(sk)(col("item")).as("e"))
      .as[Long].collect()
    all(ests) should be >= 1L
    // depth-1 sketch can only be looser (min over fewer lanes)
    val sk1 = CountMin.build(itemsDf(items), "item", width = 64, depth = 1)
    items.take(50).foreach { it =>
      sk1.estimateOf(it) should be >= sk.estimateOf(it)
    }
  }

  test("heavy-hitter candidates always contain the true heavy hitters") {
    val heavy = Seq.fill(60)("dominant")
    val noise = (1 to 100).map(i => s"n$i")
    val df = itemsDf(heavy ++ noise)
    val sk = CountMin.build(df, "item", width = 128, depth = 3)
    // threshold: >= 1/4 of total (160) = 40 — only "dominant" truly
    val cand = CountMin.heavyHitterCandidates(df, "item", sk, 1L, 4L)
      .as[(String, Long)].collect().toMap
    cand.keySet should contain("dominant")
    cand("dominant") should be >= 60L
  }

  test("heavyHitters ≡ candidates + corpus-wide exact join, in ONE " +
      "bounded pass (filter below the single exchange)") {
    val heavy = Seq.fill(60)("dominant") ++ Seq.fill(45)("second")
    val noise = (1 to 120).map(i => s"n$i")
    // a REAL scan (parquet, not a local Seq): a LocalTableScan would
    // let Catalyst constant-fold the estimate filter away and the
    // plan-shape assertions below would be vacuous
    val p = java.nio.file.Files.createTempDirectory("cms_hh_").toString +
      "/items"
    itemsDf(heavy ++ noise).write.parquet(p)
    val df = spark.read.parquet(p)
    val sk = CountMin.build(df, "item", width = 128, depth = 3)
    val rep = CountMin.heavyHitters(df, "item", sk, 1L, 8L)
    // plan shape BEFORE execution (AQE finalization rewrites the
    // string): ONE shuffle; the min-lane estimate filter and the
    // partial aggregate both run BELOW it (map-side) — the exchange
    // only ever carries candidate items
    val plan = rep.queryExecution.executedPlan.toString
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    exIdx should be >= 0
    plan.indexOf("Exchange hashpartitioning", exIdx + 1) should be < 0
    plan.indexOf("partial_count", exIdx) should be > 0
    plan.indexOf("Filter", exIdx) should be > 0
    plan.indexOf("least(", exIdx) should be > 0
    // row-for-row equality with the two-pass composition it replaces
    val exact = df.groupBy(col("item")).agg(count(lit(1)).as("exact"))
    val old = CountMin.heavyHitterCandidates(df, "item", sk, 1L, 8L)
      .join(exact, Seq("item"))
      .select(col("item"), col("est"), col("exact"))
    rep.collect().toSeq should contain theSameElementsAs old.collect().toSeq
  }

  test("the build aggregation is bounded by the sketch, not the corpus") {
    val df = itemsDf((1 to 2000).map(i => s"x$i"))
    val sk = CountMin.build(df, "item", width = 64, depth = 2)
    sk.counts.size shouldBe 128
    sk.counts.sum shouldBe 2000L * 2 // each occurrence once per lane
  }

  test("merge is exact counter addition: split builds equal the " +
    "one-shot build, empty is the identity") {
    val items = (1 to 300).map(i => s"m${i % 40}")
    val (a, b) = items.splitAt(117)
    val whole = CountMin.build(itemsDf(items), "item", width = 64, depth = 3)
    val skA = CountMin.build(itemsDf(a), "item", width = 64, depth = 3)
    val skB = CountMin.build(itemsDf(b), "item", width = 64, depth = 3)
    CountMin.merge(skA, skB).counts shouldBe whole.counts
    CountMin.merge(skB, skA).counts shouldBe whole.counts // commutative
    CountMin.merge(CountMin.empty(64, 3), whole).counts shouldBe whole.counts
  }

  test("merge refuses shape mismatches") {
    an[IllegalArgumentException] should be thrownBy
      CountMin.merge(CountMin.empty(64, 3), CountMin.empty(128, 3))
    an[IllegalArgumentException] should be thrownBy
      CountMin.merge(CountMin.empty(64, 3), CountMin.empty(64, 2))
  }

  test("parameter guards") {
    val df = itemsDf(Seq("a"))
    an[IllegalArgumentException] should be thrownBy
      CountMin.build(df, "item", width = 32, depth = 3)
    an[IllegalArgumentException] should be thrownBy
      CountMin.build(df, "item", width = 1 << 20, depth = 4)
    val sk = CountMin.build(df, "item", width = 64, depth = 1)
    an[IllegalArgumentException] should be thrownBy
      CountMin.heavyHitterCandidates(df, "item", sk, 1L, 0L)
  }
}
