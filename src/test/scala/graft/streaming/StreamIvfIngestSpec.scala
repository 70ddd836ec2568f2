package graft.streaming

import graft.SparkSpec
import graft.Tables
import graft.ext.{IvfIndex, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Cross-session restart of the streaming IVF ingestion
  * ([[IvfIndex.streamingAppendBatch]]) — the StreamIncLshRestartSpec
  * contract applied to the family's third streaming face: a driver
  * killed AFTER a batch's fold-in but BEFORE its checkpoint commit
  * (the commit file removed — byte-for-byte the state a real kill in
  * that window leaves) must resume in a NEW SparkSession with the
  * replayed batch SKIPPED (the fold-in is the body's only effect and
  * the identity-scoped marker proves it happened), no duplicate
  * assignment rows, and the drift counters folded exactly once.
  */
class StreamIvfIngestSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf, "embeddings")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ivfingest_").toString

  private def delete(root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def runStream(session: SparkSession, root: String): Unit = {
    val schema = session.read.parquet(s"$root/arrivals").schema
    val q = session.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/arrivals")
      .writeStream
      .foreachBatch(IvfIndex.streamingAppendBatch(session, s"$root/idx")(
        (_, _) => ()))
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("kill after fold-in, before commit: a new session skips the replay exactly") {
    val root = tmp()
    try {
      val corpus = emb.filter(col("vec_id") < 100)
      val centroids = emb.filter(col("vec_id") < 4)
      IvfIndex.save(spark, s"$root/idx", centroids,
        Some(Similarity.assignToCentroids(corpus, centroids)))
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 160)
        .select(col("vec_id"), col("embedding"))
        .repartition(3).write.parquet(s"$root/arrivals")
      runStream(spark, root)
      IvfIndex.appendedThrough(spark, s"$root/idx") shouldBe 2L
      val stat1 = IvfIndex.driftStat(spark, s"$root/idx")
      stat1.appendedN shouldBe 60L
      val rows1 = IvfIndex.load(spark, s"$root/idx").assignments.get.count()
      rows1 shouldBe 160L
      // crash window: batch 2 folded + marker recorded, commit missing
      val commit2 = new org.apache.hadoop.fs.Path(s"$root/ckpt/commits/2")
      commit2.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(commit2, false) shouldBe true
      runStream(spark.newSession(), root)
      // replay SKIPPED: no duplicate assignment rows, counters
      // unchanged (a double fold-in would distort both)
      IvfIndex.load(spark, s"$root/idx").assignments.get.count() shouldBe rows1
      IvfIndex.driftStat(spark, s"$root/idx") shouldBe stat1
      IvfIndex.appendedThrough(spark, s"$root/idx") shouldBe 2L
      // and the grown index still serves: every corpus + arrival id
      // assigned exactly once
      IvfIndex.load(spark, s"$root/idx").assignments.get
        .select("vec_id").distinct().count() shouldBe 160L
    } finally delete(root)
  }

  test("full lifecycle: stream → kill → remove → purge-compaction → resume SAME checkpoint → stream more") {
    // family symmetry with the LSH/SRP/label-store lifecycle pins:
    // the marker survives compactAssignments' purge restamp, the
    // stream resumes after the file set changed under the checkpoint,
    // and the final assignments equal a lifecycle that never saw the
    // removed vectors but saw every streamed arrival.
    val root = tmp()
    try {
      val corpus = emb.filter(col("vec_id") < 100)
      val centroids = emb.filter(col("vec_id") < 4)
      val removedIds = emb.filter(col("vec_id") >= 10 && col("vec_id") < 40)
        .select("vec_id")
      val phase1 = emb.filter(col("vec_id") >= 100 && col("vec_id") < 160)
      val phase2 = emb.filter(col("vec_id") >= 160 && col("vec_id") < 220)
      IvfIndex.save(spark, s"$root/idx", centroids,
        Some(Similarity.assignToCentroids(corpus, centroids)))
      phase1.select(col("vec_id"), col("embedding"))
        .repartition(2).write.parquet(s"$root/arrivals")
      runStream(spark, root) // batches 0, 1
      IvfIndex.appendedThrough(spark, s"$root/idx") shouldBe 1L
      // kill in the replay window; takedown + purge land while down
      delete(s"$root/ckpt/commits/1")
      IvfIndex.remove(spark, s"$root/idx", removedIds)
      IvfIndex.compactAssignments(spark, s"$root/idx")
      // the purge restamped the meta and dropped the tombstones but
      // must NOT have touched the replay marker or the drift ledger
      IvfIndex.appendedThrough(spark, s"$root/idx") shouldBe 1L
      IvfIndex.driftStat(spark, s"$root/idx").appendedN shouldBe 60L
      phase2.select(col("vec_id"), col("embedding"))
        .repartition(2).write.mode("append").parquet(s"$root/arrivals")
      runStream(spark.newSession(), root) // replays 1 (skip), folds 2, 3
      IvfIndex.appendedThrough(spark, s"$root/idx") shouldBe 3L
      IvfIndex.driftStat(spark, s"$root/idx").appendedN shouldBe 120L
      // final assignments ≡ assigning (corpus ∖ removed) ∪ arrivals
      // against the same frozen centroids — assignment is per-vector
      // deterministic, so frame equality is exact
      val survivor = corpus
        .filter(!(col("vec_id") >= 10 && col("vec_id") < 40))
        .unionByName(phase1).unionByName(phase2)
      val expected = Similarity.assignToCentroids(survivor, centroids)
        .select("vec_id", "centroid_id")
      val got = IvfIndex.load(spark, s"$root/idx").assignments.get
        .select("vec_id", "centroid_id")
      got.count() shouldBe 190L
      def dump(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toString).sorted.toSeq
      dump(got) shouldBe dump(expected)
    } finally delete(root)
  }

  test("a fresh checkpoint against a stream-folded index fails loudly") {
    val root = tmp()
    try {
      val corpus = emb.filter(col("vec_id") < 100)
      val centroids = emb.filter(col("vec_id") < 4)
      IvfIndex.save(spark, s"$root/idx", centroids,
        Some(Similarity.assignToCentroids(corpus, centroids)))
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 140)
        .select(col("vec_id"), col("embedding"))
        .repartition(2).write.parquet(s"$root/arrivals")
      runStream(spark, root)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        val schema = spark.read.parquet(s"$root/arrivals").schema
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/arrivals")
          .writeStream
          .foreachBatch(IvfIndex.streamingAppendBatch(spark, s"$root/idx")(
            (_, _) => ()))
          .option("checkpointLocation", s"$root/ckpt2")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      e.getCause.getMessage should include("misclassify")
    } finally delete(root)
  }
}
