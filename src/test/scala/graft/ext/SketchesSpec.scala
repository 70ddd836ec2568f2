package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV cardinality sketch: exact below k, partitioning-invariant
  * (merge correctness), estimator within theory error, bounded
  * buffer.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def kmvOver(values: Seq[Long], k: Int, partitions: Int): Double = {
    val hashed = values.toDF("v")
      .repartition(partitions)
      .select(Dedup.hexHash(col("v").cast("string"), "t#").as("hv"))
      .as[Long]
    hashed.groupByKey(_ => 1).agg(Sketches.kmv[Long](k)(identity).toColumn)
      .collect().head._2
  }

  test("fewer than k distinct values → exact count (duplicates collapse)") {
    val vs = (1L to 50L) ++ (1L to 50L) // 100 rows, 50 distinct
    kmvOver(vs, k = 128, partitions = 4) shouldBe 50.0
  }

  test("merge correctness: estimate is partitioning-invariant") {
    val vs = (1L to 5000L)
    val one = kmvOver(vs, k = 64, partitions = 1)
    val eight = kmvOver(vs, k = 64, partitions = 8)
    eight shouldBe one // same k-min set regardless of partial-agg split
  }

  test("estimate lands within theory error of the true cardinality") {
    // KMV relative standard error ≈ 1/sqrt(k-2); at k=256 that is
    // ~6.3%, so ±4σ = ±25% is a deterministic-fixture-safe bound
    val n = 20000L
    val est = kmvOver(1L to n, k = 256, partitions = 8)
    est should be > n * 0.75
    est should be < n * 1.25
  }

  test("estimate matches the closed-form formula on the final buffer") {
    Sketches.estimate(Array(10L, 20L, 30L), k = 8) shouldBe 3.0 // below k: exact
    Sketches.estimate(Array(100L, 200L, 400L), k = 3) shouldBe
      (2 * Sketches.HashSpace / 400L)
  }

  test("kmvSet: merged sketches equal the sketch of the union (set algebra)") {
    // the property q92 rests on: sk(A) ⊕ sk(B) = sk(A ∪ B)
    val k = 32
    def sk(vs: Seq[Long], salt: String = "t#"): Seq[Long] =
      vs.toDF("v")
        .select(Dedup.hexHash(col("v").cast("string"), salt).as("hv"))
        .as[Long].groupByKey(_ => 1)
        .agg(Sketches.kmvSet[Long](k)(identity).toColumn)
        .collect().head._2
    val a = (1L to 300L)
    val b = (200L to 500L) // overlaps a
    val merged = (sk(a) ++ sk(b)).distinct.sorted.take(k)
    merged shouldBe sk(a ++ b)
    // membership transfer: every union-sketch element that is in set A
    // is in sketch(A) — membership against the sketch IS membership
    // against the set
    val hashA = sk(a, "t#").toSet
    merged.filter(hashA.contains).toSet shouldBe (merged.toSet intersect hashA)
  }

  test("kmvSet intersection estimate lands near the true overlap") {
    val k = 256
    def sk(vs: Seq[Long]): Seq[Long] =
      vs.toDF("v")
        .select(Dedup.hexHash(col("v").cast("string"), "x#").as("hv"))
        .as[Long].groupByKey(_ => 1)
        .agg(Sketches.kmvSet[Long](k)(identity).toColumn)
        .collect().head._2
    val a = (1L to 1000L)
    val b = (501L to 1500L) // |A∩B| = 500, |A∪B| = 1500, J = 1/3
    val (sa, sb) = (sk(a), sk(b))
    val u = (sa ++ sb).distinct.sorted.take(k)
    val m = u.count(h => sa.contains(h) && sb.contains(h))
    val unionEst = Sketches.estimate(u.toArray, k)
    val interEst = (m.toDouble / u.length) * unionEst
    interEst should be(500.0 +- 250.0) // J·U each ~1/sqrt(k) rel. error
    unionEst should be(1500.0 +- 400.0)
  }

  private def qsAgg(k: Int) =
    Sketches.quantileSketch[(Long, Double)](k, Seq(0.5, 0.9))(_._1, _._2)

  test("quantile sketch: merge is associative and commutative") {
    val agg = qsAgg(8)
    def buf(vs: Seq[(Long, Double)]) =
      vs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    def pairs(seed: Int, n: Int): Seq[(Long, Double)] =
      (1 to n).map(i => ((i * 2654435761L + seed * 40503L) & ((1L << 52) - 1),
        (i * seed).toDouble))
    val (a, b, c) = (pairs(1, 20), pairs(2, 7), pairs(3, 31))
    def snap(x: Sketches.QSketchBuf) = (x.hs.toSeq, x.vs.toSeq)
    snap(agg.merge(agg.merge(buf(a), buf(b)), buf(c))) shouldBe
      snap(agg.merge(buf(a), agg.merge(buf(b), buf(c))))
    snap(agg.merge(buf(b), buf(a))) shouldBe snap(agg.merge(buf(a), buf(b)))
  }

  test("quantile sketch: buffer is bounded by k and keeps the k min hashes") {
    val agg = qsAgg(4)
    val rows = (1L to 100L).map(h => (h, h * 10.0))
    val b = rows.foldLeft(agg.zero)((x, r) => agg.reduce(x, r))
    b.hs.toSeq shouldBe Seq(1L, 2L, 3L, 4L)
    b.vs.toSeq shouldBe Seq(10.0, 20.0, 30.0, 40.0)
  }

  test("quantile sketch: hash collision keeps the min value (set-determined)") {
    val agg = qsAgg(4)
    val b = agg.reduce(agg.reduce(agg.zero, (7L, 5.0)), (7L, 3.0))
    b.vs.toSeq shouldBe Seq(3.0)
    // same via merge across buffers
    val m = agg.merge(agg.reduce(agg.zero, (7L, 5.0)),
                      agg.reduce(agg.zero, (7L, 3.0)))
    m.vs.toSeq shouldBe Seq(3.0)
  }

  test("quantile sketch: estimate is partitioning-invariant and near exact") {
    val rows = (1L to 10000L).map(i => (i, i.toDouble)) // values 1..10000
    def estimate(partitions: Int): Seq[Double] =
      rows.toDF("id", "v")
        .repartition(partitions)
        .select(Dedup.hexHash(col("id").cast("string"), "q#").as("h"),
          col("v"))
        .as[(Long, Double)]
        .groupByKey(_ => 1)
        .agg(qsAgg(256).toColumn).collect().head._2
    val one = estimate(1)
    estimate(8) shouldBe one // same bottom-k sample regardless of split
    // sample-quantile rank error O(1/sqrt(k)) → generous deterministic band
    one(0) should be(5000.0 +- 1500.0)
    one(1) should be(9000.0 +- 1200.0)
  }

  test("sampleQuantile picks the floor(q*(n-1)) rank") {
    Sketches.sampleQuantile(Array(1.0, 2.0, 3.0, 4.0), 0.5) shouldBe 2.0
    Sketches.sampleQuantile(Array(1.0, 2.0, 3.0, 4.0), 1.0) shouldBe 4.0
    Sketches.sampleQuantile(Array(1.0, 2.0, 3.0, 4.0), 0.0) shouldBe 1.0
    Sketches.sampleQuantile(Array.empty[Double], 0.5).isNaN shouldBe true
  }

  test("weighted sampling: weight-3 items picked at ~3x the weight-1 rate") {
    // 2000 items, half weight 1, half weight 3 → expected sample
    // composition 1:3; the fixture is deterministic (md5), so a
    // generous ±30% band around the expected ratio never flakes
    val df = (1L to 2000L).toDF("id")
      .withColumn("w", when(col("id") % 2 === 0, 3).otherwise(1))
    val sample = df
      .withColumn("k", Sketches.weightedKey(col("id"), col("w"), "t#"))
      .orderBy(col("k")).limit(400)
    val byW = sample.groupBy("w").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ratio = byW(3).toDouble / byW(1)
    ratio should be > 2.1
    ratio should be < 4.2
    byW(3) + byW(1) shouldBe 400L
  }

  test("native weightedKey is bit-identical to the HOF formulation it replaced") {
    val hof = (1L to 300L).toDF("id")
      .withColumn("w", (col("id") % 3 + 1).cast("int"))
      .withColumn("k", array_min(transform(sequence(lit(1), col("w")),
        j => Dedup.hexHash(
          concat(col("id").cast("string"), lit("#"), j.cast("string")), "p#"))))
      .select("id", "k").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = (1L to 300L).toDF("id")
      .withColumn("w", (col("id") % 3 + 1).cast("int"))
      .withColumn("k", Sketches.weightedKey(col("id"), col("w"), "p#"))
      .select("id", "k").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    native shouldBe hof
  }

  test("weighted sampling is deterministic and plans as TakeOrdered (no full sort)") {
    val df = (1L to 500L).toDF("id").withColumn("w", lit(2))
    def pick() = df
      .withColumn("k", Sketches.weightedKey(col("id"), col("w"), "s#"))
      .orderBy(col("k")).limit(50)
    pick().collect().map(_.getLong(0)).toSeq shouldBe
      pick().collect().map(_.getLong(0)).toSeq
    // per-partition top-k, not a global sort shuffle
    pick().queryExecution.executedPlan.toString should include("TakeOrderedAndProject")
  }
}
