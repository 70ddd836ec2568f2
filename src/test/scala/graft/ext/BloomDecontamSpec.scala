package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomDecontamSpec extends SparkSpec {
  import spark.implicits._

  private def refFrame(grams: String*) = grams.toDF("gram")

  test("no false negatives: every folded gram tests positive") {
    val grams = (0 until 200).map(i => s"gram_$i alpha beta")
    val ref = refFrame(grams: _*)
    val bloom = BloomDecontam.build(ref, "gram", mBits = 1 << 12, k = 3)
    val misses = ref
      .filter(!BloomDecontam.contains(bloom)(col("gram")))
      .count()
    misses shouldBe 0L
  }

  test("contains ≡ positions-subset-of-reference-positions (the oracle's formulation)") {
    val ref = refFrame((0 until 50).map(i => s"bench_$i"): _*)
    val mBits = 128 // tiny on purpose: force collisions / false positives
    val bloom = BloomDecontam.build(ref, "gram", mBits, k = 3)
    val probe = (0 until 400).map(i => s"probe_$i").toDF("gram")
      .union(ref.limit(10))
    // oracle formulation: distinct reference positions as a set
    val refPos = ref
      .select(explode(BloomDecontam.positions(col("gram"), mBits, 3)).as("p"))
      .distinct().as[Long].collect().toSet
    val got = probe
      .withColumn("bloom_hit", BloomDecontam.contains(bloom)(col("gram")))
      .withColumn("ps", BloomDecontam.positions(col("gram"), mBits, 3))
      .select(col("gram"), col("bloom_hit"), col("ps"))
      .as[(String, Boolean, Seq[Long])].collect()
    got.foreach { case (gram, hit, ps) =>
      val expected = ps.forall(refPos.contains)
      assert(hit === expected, s"gram=$gram ps=$ps")
    }
    // the tiny filter must actually produce some false positives, or
    // the equivalence above tested nothing beyond the trivial branch
    val fp = got.count { case (g, hit, _) => hit && g.startsWith("probe_") }
    assert(fp > 0, "fixture too clean: no false positives exercised")
  }

  test("positions: k disjoint md5 lanes mod mBits, within range") {
    val df = Seq("a", "b", "hello world").toDF("gram")
    val rows = df.select(BloomDecontam.positions(col("gram"), 4096, 4))
      .as[Seq[Long]].collect()
    rows.foreach { ps =>
      ps should have size 4
      all(ps) should (be >= 0L and be < 4096L)
    }
    // deterministic across evaluations
    val again = df.select(BloomDecontam.positions(col("gram"), 4096, 4))
      .as[Seq[Long]].collect()
    rows shouldBe again
  }

  test("build collect is bounded by mBits rows by construction; fillFraction sane") {
    val ref = refFrame((0 until 5000).map(i => s"g$i"): _*)
    val mBits = 512 // far fewer bits than grams — saturates, still correct
    val bloom = BloomDecontam.build(ref, "gram", mBits, k = 2)
    bloom.setBitCount should be <= mBits
    bloom.fillFraction should be <= 1.0
    // saturated filter: everything tests positive (degenerate but honest)
    val hits = refFrame("definitely unseen").select(
      BloomDecontam.contains(bloom)(col("gram"))).as[Boolean].head()
    if (bloom.fillFraction == 1.0) hits shouldBe true
  }

  test("flagDocs is map-side: no shuffle in the plan") {
    val ref = refFrame("w1_w2_w3_w4_w5")
    val bloom = BloomDecontam.build(ref, "gram", 1 << 12, 3)
    val docs = Seq((1L, "w1 w2 w3 w4 w5 w6"), (2L, "a b c d e f"))
      .toDF("doc_id", "text")
    val flagged = BloomDecontam.flagDocs(docs, "text", 5, bloom)
    val plan = flagged.queryExecution.executedPlan.toString
    plan should not include "Exchange"
    val rows = flagged.select(col("doc_id"), col("n_bloom_hit"),
      col("contaminated")).as[(Long, Int, Boolean)].collect().sortBy(_._1)
    rows(0) shouldBe ((1L, 1, true))
    rows(1)._3 shouldBe false
  }

  test("parameter guards: k and mBits ranges fail fast") {
    val g = col("gram")
    an[IllegalArgumentException] should be thrownBy
      BloomDecontam.positions(g, 4096, 0)
    an[IllegalArgumentException] should be thrownBy
      BloomDecontam.positions(g, 4096, 5)
    an[IllegalArgumentException] should be thrownBy
      BloomDecontam.positions(g, 32, 3)
    an[IllegalArgumentException] should be thrownBy
      BloomDecontam.positions(g, BloomDecontam.MaxBits + 1, 3)
  }
}
