package graft.ext

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** Similarity search quality: IVF must be a faithful approximation of
  * brute force — perfect self-retrieval, and high recall@k against the
  * exact top-k on real embeddings.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf, "embeddings")

  test("brute-force knn ranks self first with cosine 1.0") {
    val out = Similarity.bruteForceKnn(emb, emb.filter(col("vec_id") < 3), k = 5)
      .filter(col("rank") === 1).collect()
    out.length shouldBe 3
    out.foreach { r =>
      r.getAs[Long]("neighbor_id") shouldBe r.getAs[Long]("query_id")
      r.getAs[Double]("cosine") shouldBe 1.0
    }
  }

  test("IVF recall@5 vs brute force is usable (> 0.5) and self is found") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceKnn(emb, queries, k = 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfKnn(emb, emb.filter(col("vec_id") < 16),
        queries, k = 5, nprobe = 4)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    recall should be > 0.5
    // every query's own vector must survive the cluster pruning
    (0L until 10L).foreach(q => approx should contain((q, q)))
  }

  test("assignToCentroids covers every vector exactly once") {
    val assigned = Similarity.assignToCentroids(emb, emb.filter(col("vec_id") < 8))
    assigned.count() shouldBe emb.count()
    assigned.select("vec_id").distinct().count() shouldBe emb.count()
  }
}
