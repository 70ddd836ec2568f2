package graft.functions

import graft.SparkSpec
import graft.ext.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[NearestCentroid]] — the map-side argmax expression behind
  * `Similarity.assignToCentroids`. The load-bearing contract: results
  * bit-identical to the r06 `crossJoin + max_by(struct(cos, -cid))`
  * formulation it replaced (rebuilt inline here as the reference),
  * including every null/tie edge, and the generated code actually
  * compiles (codegen fallback disabled).
  */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  // the r06 formulation, kept as the spec's reference semantics
  private def legacyAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val c = centroids.select(col("vec_id").as("centroid_id"),
      col("embedding").as("cent_vec"))
    corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(c))
      .withColumn("c_cos", Similarity.cosine(col("embedding"), col("cent_vec")))
      .groupBy(col("vec_id"))
      .agg(first(col("embedding")).as("embedding"),
        max_by(col("centroid_id"),
          struct(col("c_cos"), (-col("centroid_id")).as("neg_id")))
          .as("centroid_id"))
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
  }

  private def fixture: (DataFrame, DataFrame) = {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),   // exactly centroid 10
      (1L, Array(0.0f, 1.0f, 0.0f)),   // exactly centroid 11
      (2L, Array(0.7f, 0.7f, 0.0f)),   // EQUAL cosine to 10 and 11 → tie → min id
      (3L, Array(0.0f, 0.0f, 0.0f)),   // zero magnitude → all null → min id
      (4L, Array(-1.0f, 0.0f, 0.0f)),  // best of the bad options
      (5L, null.asInstanceOf[Array[Float]])) // null vector → min id
      .toDF("vec_id", "embedding")
    val centroids = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 1.0f, 0.0f)),
      (12L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    (corpus, centroids)
  }

  test("bit-identical to the legacy crossJoin+max_by formulation on every edge") {
    val (corpus, centroids) = fixture
    val got = Similarity.assignToCentroids(corpus, centroids)
      .select("vec_id", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = legacyAssign(corpus, centroids)
      .select("vec_id", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    got shouldBe want
    // and the edges land where the contract says, not just "same as legacy"
    val byId = got.toMap
    byId(2L) shouldBe 10L // tie → smaller centroid id
    byId(3L) shouldBe 10L // zero vector → all-null fallback = min id
    byId(5L) shouldBe 10L // null vector → min id
  }

  test("generated code compiles: identical results with codegen fallback disabled") {
    val (corpus, centroids) = fixture
    val relaxed = Similarity.assignToCentroids(corpus, centroids)
      .select("vec_id", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    // CODEGEN_ONLY + fallback off: a broken doGenCode throws instead of
    // silently falling back to interpreted eval
    val strict = withConfs(
      "spark.sql.codegen.fallback" -> "false",
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      Similarity.assignToCentroids(corpus, centroids)
        .select("vec_id", "centroid_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    strict shouldBe relaxed
  }

  test("arithmetic-NaN cosine (overflow / NaN components) wins as 1.0, like the legacy clamp") {
    // double-typed vectors large enough that dot and norms overflow to
    // Inf: cosine = Inf/Inf = NaN, which the legacy column clamp
    // least(greatest(NaN,-1),1) maps to 1.0 — a WIN, not a null loss
    val corpus = Seq(
      (0L, Array(1e200, 1e200)), // overflows against centroid 20
      (1L, Array(1.0, 0.0)))     // sanity row, real cosines only
      .toDF("vec_id", "embedding")
    val centroids = Seq(
      (20L, Array(1e200, 1e200)),      // overflow pairing
      (21L, Array(1.0, 0.0)),
      (22L, Array(Double.NaN, 1.0)))   // NaN component → NaN cos → 1.0
      .toDF("vec_id", "embedding")
    val got = Similarity.assignToCentroids(corpus, centroids)
      .select("vec_id", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = legacyAssign(corpus, centroids)
      .select("vec_id", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    got shouldBe want
    // row 0: NaN-clamped 1.0 vs both 20 and 22 → tie → min id 20.
    // row 1: exact cosine 1.0 vs 21 TIES the NaN-clamped 1.0 vs 22 →
    // min id 21 — the clamp makes NaN equal to, not above, a perfect
    // match, so the tie-break decides
    got.toMap.apply(0L) shouldBe 20L
    got.toMap.apply(1L) shouldBe 21L
  }

  test("length-mismatched centroid never wins; matching one does") {
    val corpus = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val centroids = Seq(
      (7L, Array(1.0f, 0.0f, 0.0f)), // 3-dim vs 2-dim row → null cosine
      (9L, Array(0.5f, 0.5f)))       // real candidate
      .toDF("vec_id", "embedding")
    Similarity.assignToCentroids(corpus, centroids)
      .select("centroid_id").head().getLong(0) shouldBe 9L
  }

  test("empty and oversized centroid sets fail fast") {
    intercept[IllegalArgumentException] {
      NearestCentroid.nearest(lit(Array(1.0)), Seq.empty)
    }.getMessage should include("at least one")
    val tooMany = (0 to NearestCentroid.MaxCentroids)
      .map(i => (i.toLong, Array(1.0)))
    intercept[IllegalArgumentException] {
      NearestCentroid.nearest(lit(Array(1.0)), tooMany)
    }.getMessage should include("two-level")
  }
}
