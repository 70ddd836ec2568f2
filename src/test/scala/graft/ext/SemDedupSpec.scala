package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Two tight groups around orthogonal axes plus a lone outlier.
  // Group A (ids 1, 2, 3) points near +x; group B (ids 10, 11) points
  // near +y; id 20 sits between them (cosine < threshold to both
  // groups' members but assigned SOMEWHERE).
  private def axis(main: Int, eps: Double, off: Int): Seq[Double] = {
    val v = Array.fill(4)(0.0)
    v(main) = 1.0
    v(off) = eps
    v.toSeq
  }

  private def corpus: DataFrame = Seq(
    (1L, axis(0, 0.00, 1)),
    (2L, axis(0, 0.01, 1)),
    (3L, axis(0, 0.02, 1)),
    (10L, axis(1, 0.00, 2)),
    (11L, axis(1, 0.01, 2)),
    (20L, Seq(0.7, 0.7, 0.1, 0.0))
  ).toDF("vec_id", "embedding")

  private def centroids: DataFrame = Seq(
    (100L, Seq(1.0, 0.0, 0.0, 0.0)),
    (200L, Seq(0.0, 1.0, 0.0, 0.0))
  ).toDF("vec_id", "embedding")

  test("within-cluster groups collapse to their min id; singletons keep") {
    val surv = SemDedup
      .assignedSurvivors(corpus, centroids, threshold = 0.95)
      .select(col("id"), col("rep"), col("keep"))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    surv.map(r => r._1 -> ((r._2, r._3))).toMap shouldBe Map(
      1L -> ((1L, true)), 2L -> ((1L, false)), 3L -> ((1L, false)),
      10L -> ((10L, true)), 11L -> ((10L, false)),
      20L -> ((20L, true)))
  }

  test("pairs carry the cluster id and exact cosine; id_a < id_b") {
    val pairs = SemDedup
      .semanticDupPairs(corpus, centroids, threshold = 0.95)
      .select(col("centroid_id"), col("id_a"), col("id_b"), col("cosine"))
      .as[(Long, Long, Long, Double)].collect().sortBy(p => (p._2, p._3))
    pairs.map(p => (p._1, p._2, p._3)) shouldBe Array(
      (100L, 1L, 2L), (100L, 1L, 3L), (100L, 2L, 3L), (200L, 10L, 11L))
    all(pairs.map(_._4)) should be >= 0.95
    all(pairs.map(_._4)) should be <= 1.0
  }

  test("a high-cosine pair straddling a centroid boundary is NEVER " +
    "compared — the published SemDeDup miss semantics") {
    // two near-identical vectors placed exactly on either side of the
    // centroid bisector: cosine(a, b) ≈ 1 but they assign to different
    // clusters, so no pair is emitted and both survive
    val straddle = Seq(
      (1L, Seq(1.0, 0.99, 0.0, 0.0)),
      (2L, Seq(0.99, 1.0, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val pairs = SemDedup.semanticDupPairs(straddle, centroids, 0.9)
    pairs.count() shouldBe 0L
    val surv = SemDedup.assignedSurvivors(straddle, centroids, 0.9)
      .select(col("id"), col("keep")).as[(Long, Boolean)].collect()
    surv.toMap shouldBe Map(1L -> true, 2L -> true)
    // sanity: the missed pair IS above threshold when compared exactly
    BoundedPairs.allPairs(
        straddle.select(col("vec_id").as("id"), col("embedding").as("v")),
        "id")
      .select(Similarity.cosine(col("v_a"), col("v_b")))
      .as[Double].head() should be >= 0.9
  }

  test("cluster cap drops the oversized cluster from comparison and " +
    "reports it in the census") {
    val (pairs, census) = SemDedup.semanticDupPairsWithStats(
      corpus, centroids, threshold = 0.95, maxClusterSize = 2)
    // cluster 100 has 4 members (1, 2, 3, and the tie-broken 20 —
    // over the cap of 2) — dropped whole; cluster 200 (2) still pairs
    census.anyDropped shouldBe true
    census.droppedBuckets shouldBe 1L
    census.droppedRows shouldBe 4L
    pairs.select(col("id_a"), col("id_b")).as[(Long, Long)]
      .collect().toSeq shouldBe Seq((10L, 11L))
  }

  test("zero-magnitude vectors never pair (null cosine)") {
    val withZero = corpus.union(Seq(
      (30L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding"))
    val pairs = SemDedup.semanticDupPairs(withZero, centroids, -1.0)
    pairs.filter(col("id_a") === 30L || col("id_b") === 30L)
      .count() shouldBe 0L
    // but the zero vector still gets an assignment row and survives
    val surv = SemDedup.assignedSurvivors(withZero, centroids, 0.95)
    surv.filter(col("id") === 30L).select(col("keep"))
      .as[Boolean].head() shouldBe true
  }

  test("threshold outside [-1, 1] is rejected") {
    an[IllegalArgumentException] should be thrownBy
      SemDedup.semanticDupPairs(corpus, centroids, 1.5)
  }

  test("candidate generation is a cluster-keyed equi-join — no " +
    "cartesian product in the plan") {
    val (pairs, caches, _) = SemDedup.semanticDupPairsLazy(
      corpus, centroids, 0.95, "vec_id", "embedding", LshSkew.NoCap)
    try {
      val physical = pairs.queryExecution.executedPlan.toString
      physical should not include "CartesianProduct"
      physical should not include "BroadcastNestedLoopJoin"
    } finally caches.foreach(_.unpersist())
  }
}
