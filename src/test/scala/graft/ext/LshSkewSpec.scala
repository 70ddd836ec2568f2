package graft.ext

import graft.SparkSpec

/** Bucket-size skew guard (the 100 TB LSH scale-killer defense):
  * adversarial all-identical-docs fixtures must produce BOUNDED
  * candidate counts under a cap. The DEFAULT cap is finite
  * ([[LshSkew.DefaultMaxBucketSize]], 100 k — the measured 2 M-doc
  * uncapped run filled the disk) and must genuinely drop a bucket
  * past it; fixture-scale buckets sit far below it, so default runs
  * stay bit-identical to the explicit [[LshSkew.NoCap]] opt-out.
  */
class LshSkewSpec extends SparkSpec {
  import spark.implicits._

  // 200 byte-identical docs (the degenerate bucket: every band key
  // collides for all of them) plus one genuine small near-dup pair
  // whose buckets stay tiny.
  private def adversarialDocs = {
    val boiler = (1 to 200).map(i => (i.toLong, "the same boilerplate page body repeated verbatim"))
    // byte-identical so every band matches deterministically (J = 1.0)
    val pairA = Seq((900L, "alpha beta gamma delta epsilon zeta"),
                    (901L, "alpha beta gamma delta epsilon zeta"))
    (boiler ++ pairA).toDF("doc_id", "text")
  }

  test("below the default cap: identical-doc cluster goes quadratic (C(200,2) pairs)") {
    // 200 ≪ DefaultMaxBucketSize, so the default-capped run keeps the
    // degenerate cluster's full pair set — the cap only bites past 100 k
    val pairs = Dedup.lshNearDupPairs(adversarialDocs, "text", "doc_id")
    pairs.filter($"id_a" < 900).count() shouldBe 200L * 199 / 2
  }

  test("default cap is FINITE; NoCap is the explicit opt-out and is bit-identical here") {
    LshSkew.DefaultMaxBucketSize should be < Int.MaxValue
    LshSkew.NoCap shouldBe Int.MaxValue
    val default = Dedup.lshNearDupPairs(adversarialDocs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val uncapped = Dedup.lshNearDupPairs(adversarialDocs, "text", "doc_id",
      maxBucketSize = LshSkew.NoCap)
    uncapped.collect().map(r => (r.getLong(0), r.getLong(1))).sorted shouldBe default
  }

  test("the finite default genuinely drops a degenerate 100k+ bucket") {
    import org.apache.spark.sql.functions.lit
    // capBuckets directly: a single (band, hash) key holding cap+1 rows
    // must vanish from candidate generation under the DEFAULT cap
    val banded = spark.range(LshSkew.DefaultMaxBucketSize + 1L)
      .select($"id", lit(0).as("band_idx"), lit("h").as("band_hash"))
    val (capped, caches, census) = LshSkew.capBuckets(banded,
      Seq("band_idx", "band_hash"), LshSkew.DefaultMaxBucketSize, "spec")
    try {
      capped.count() shouldBe 0L
      census.droppedBuckets shouldBe 1L
      census.droppedRows shouldBe LshSkew.DefaultMaxBucketSize + 1L
    } finally caches.foreach(_.unpersist())
  }

  test("capped: oversized buckets dropped, candidate count bounded, small buckets survive") {
    val pairs = Dedup.lshNearDupPairs(adversarialDocs, "text", "doc_id",
      maxBucketSize = 10)
    // the 200-member bucket is dropped in every band → zero pairs from it
    pairs.filter($"id_a" < 900).count() shouldBe 0L
    // the genuine 2-member near-dup bucket is untouched
    val kept = pairs.filter($"id_a" === 900L).collect()
    kept.length shouldBe 1
    kept.head.getLong(1) shouldBe 901L
  }

  test("cap at or above the cluster size is bit-identical to uncapped") {
    val base = Dedup.lshNearDupPairs(adversarialDocs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val capped = Dedup.lshNearDupPairs(adversarialDocs, "text", "doc_id",
      maxBucketSize = 200)
    capped.collect().map(r => (r.getLong(0), r.getLong(1))).sorted shouldBe base
  }

  test("capped text plan keeps no cartesian product") {
    val (pairs, caches, _) = Dedup.lshNearDupPairsLazy(adversarialDocs,
      "text", "doc_id", 1, 24, 3, 0.9, maxBucketSize = 10)
    val plan = pairs.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    caches.foreach(_.unpersist())
  }

  test("WithStats surfaces the census: drops on the capped run, zero on the default") {
    val (pairsCapped, censusCapped) = Dedup.lshNearDupPairsWithStats(
      adversarialDocs, "text", "doc_id", maxBucketSize = 10)
    // 200-member bucket dropped in every one of the 3 bands
    censusCapped.anyDropped shouldBe true
    censusCapped.droppedBuckets shouldBe 3L
    censusCapped.droppedRows shouldBe 600L
    pairsCapped.filter($"id_a" < 900).count() shouldBe 0L

    val (_, censusDefault) = Dedup.lshNearDupPairsWithStats(
      adversarialDocs, "text", "doc_id")
    censusDefault.anyDropped shouldBe false
    censusDefault.droppedRows shouldBe 0L
  }

  test("SRP WithStats surfaces the census") {
    val dims = 8
    val same = (1 to 100).map(i => (i.toLong, Array.fill(dims)(0.5f)))
    val df = same.toDF("vec_id", "embedding")
    val (_, census) = Similarity.srpNearDupPairsWithStats(df, 0.99, 4, 8,
      dims, maxBucketSize = 10)
    census.anyDropped shouldBe true
    // identical embeddings: all 4 bands collapse to one 100-member bucket
    census.droppedBuckets shouldBe 4L
    census.droppedRows shouldBe 400L
  }

  test("non-dividing banding is rejected fail-fast, not silently degenerate") {
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    // numBands > numHashes would band every doc into one constant md5;
    // a remainder would silently ignore signature slots — both throw
    intercept[IllegalArgumentException] {
      Dedup.lshNearDupPairs(docs, "text", "doc_id",
        shingleWidth = 1, numHashes = 24, numBands = 48, threshold = 0.9)
    }.getMessage should include("numBands")
    intercept[IllegalArgumentException] {
      Dedup.lshNearDupPairs(docs, "text", "doc_id",
        shingleWidth = 1, numHashes = 24, numBands = 5, threshold = 0.9)
    }.getMessage should include("divide")
  }

  test("SRP: identical-embedding cluster is dropped under a cap, real pair survives") {
    val dims = 8
    val same = (1 to 100).map(i => (i.toLong, Array.fill(dims)(0.5f)))
    val near = Seq(
      (900L, Array.tabulate(dims)(d => if (d == 0) 1.0f else 0.01f)),
      (901L, Array.tabulate(dims)(d => if (d == 0) 1.0f else 0.012f)))
    val df = (same ++ near).toDF("vec_id", "embedding")

    val uncapped = Similarity.srpNearDupPairs(df, 0.99, 4, 8, dims)
    uncapped.filter($"id_a" < 900).count() shouldBe 100L * 99 / 2

    val capped = Similarity.srpNearDupPairs(df, 0.99, 4, 8, dims,
      maxBucketSize = 10)
    capped.filter($"id_a" < 900).count() shouldBe 0L
    capped.filter($"id_a" === 900L).count() shouldBe 1L
  }

  test("CensusTrend: sustained growth fires, a one-off degenerate batch does not") {
    def c(rows: Long) = LshSkew.CapCensus(if (rows > 0) 1L else 0L, rows, 100)
    val t = new LshSkew.CensusTrend(window = 8)
    t.sustainedDrops(1) shouldBe false // nothing recorded yet
    // healthy stream with ONE degenerate batch in the middle
    Seq(0L, 0L, 500L, 0L, 0L).zipWithIndex.foreach { case (r, i) =>
      t.record(c(r), i.toLong)
    }
    t.sustainedDrops(3) shouldBe false // receded — no operator action
    t.totals shouldBe ((5L, 1L))
    // concentrating distribution: drops every batch, mass non-decreasing
    Seq(600L, 600L, 900L).zipWithIndex.foreach { case (r, i) =>
      t.record(c(r), (5 + i).toLong)
    }
    t.sustainedDrops(3) shouldBe true // the re-band/raise-cap signal
    t.sustainedDrops(4) shouldBe false // the 4th-back batch was clean
    t.lastK(2).map(_._2.droppedRows) shouldBe Seq(600L, 900L)
    // a receding batch clears the signal even while still dropping
    t.record(c(100L), 8L)
    t.sustainedDrops(3) shouldBe false // dropping, but mass receding
    // the window bounds state: only the last 8 rows are retained
    (9 to 30).foreach(i => t.record(c(0L), i.toLong))
    t.lastK(100).size shouldBe 8
  }
}
