package graft.streaming

import graft.SparkSpec
import graft.Tables
import graft.ext.LshIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Cross-session restart of the streaming corpus-growth dedup
  * (q110's operator): a driver killed mid-stream — AFTER a batch's
  * fold-in + sink write but BEFORE its checkpoint commit, the exact
  * window Structured Streaming replays — must resume from the
  * checkpoint + index in a NEW SparkSession and reproduce the
  * remaining pairs exactly, with no double fold-in. The crash is
  * simulated the way the engine itself defines it: the batch's
  * `commits/<id>` file is removed from the checkpoint, which is
  * byte-for-byte the on-disk state a real kill in that window leaves.
  *
  * Also pins the identity guard end-to-end through the real engine: a
  * FRESH checkpoint (new query id, batch ids restart at 0) against an
  * index another stream folded into must fail loudly, not silently
  * misclassify every batch as a replay.
  */
class StreamIncLshRestartSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf, "documents")
  private lazy val corpus = docs.filter(col("doc_id") < 40)
  private lazy val batch =
    docs.filter(col("doc_id") >= 40 && col("doc_id") < 60)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lshrestart_").toString

  private def delete(root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.orderBy("id_a", "id_b").collect().map(_.toString).toSeq

  /** One AvailableNow pass over the batch files: per-batch pair dirs
    * written with OVERWRITE (the idempotent-sink half of the
    * exactly-once contract — a replayed batch rewrites its own dir).
    */
  private def runStream(session: SparkSession, root: String): Unit = {
    val schema = session.read.parquet(s"$root/batches").schema
    val q = session.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/batches")
      .writeStream
      .foreachBatch(LshIndex.streamingDedupBatch(
        session, s"$root/idx", "text", threshold = 0.5)(
        (pairs, id) =>
          pairs.write.mode("overwrite").parquet(s"$root/pairs/batch=$id")))
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("kill after fold-in, before commit: a new session resumes exactly") {
    val root = tmp()
    val rootRef = tmp()
    try {
      LshIndex.build(spark, s"$root/idx", corpus, "text", "doc_id",
        shingleWidth = 1, numHashes = 8, numBands = 2)
      batch.select(col("doc_id"), col("text"))
        .repartition(3).write.parquet(s"$root/batches")
      runStream(spark, root)
      LshIndex.appendedThrough(spark, s"$root/idx") shouldBe 2L
      val bandedAfterRun1 = LshIndex.load(spark, s"$root/idx").banded.count()
      val pairsAfterRun1 = rows(spark.read.parquet(s"$root/pairs"))
      // crash simulation: batch 2's foreachBatch fully completed (sink
      // written, index folded, marker recorded) but the commit never
      // landed — the engine will replay batch 2 on restart. Deleted
      // through the Hadoop FS so the checksum sidecar goes with it
      val commit2 = new org.apache.hadoop.fs.Path(s"$root/ckpt/commits/2")
      commit2.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(commit2, false) shouldBe true
      // a NEW session (fresh session state over the shared context)
      // resumes from the first session's checkpoint + index
      val spark2 = spark.newSession()
      runStream(spark2, root)
      // the replayed batch reproduced its ORIGINAL emission (the
      // alreadyFolded reconstruction) — the sink holds identical rows
      rows(spark.read.parquet(s"$root/pairs")) shouldBe pairsAfterRun1
      // and folded in nothing twice
      LshIndex.load(spark, s"$root/idx").banded.count() shouldBe bandedAfterRun1
      LshIndex.appendedThrough(spark, s"$root/idx") shouldBe 2L
      // the full stream (run 1 + resumed run 2) equals the one-shot
      // incremental reference — the q109/q110 equality, held across a
      // driver death
      LshIndex.build(spark, s"$rootRef/idx", corpus, "text", "doc_id",
        shingleWidth = 1, numHashes = 8, numBands = 2)
      val (whole, _) = LshIndex.incrementalPairs(
        LshIndex.load(spark, s"$rootRef/idx"), batch, "text", threshold = 0.5)
      val expected = rows(whole)
      expected should not be empty
      rows(spark.read.parquet(s"$root/pairs")
        .select("id_a", "id_b", "jaccard")) shouldBe expected
    } finally { delete(root); delete(rootRef) }
  }

  test("a fresh checkpoint against a stream-folded index fails loudly") {
    val root = tmp()
    try {
      LshIndex.build(spark, s"$root/idx", corpus, "text", "doc_id",
        shingleWidth = 1, numHashes = 8, numBands = 2)
      batch.select(col("doc_id"), col("text"))
        .repartition(2).write.parquet(s"$root/batches")
      runStream(spark, root)
      LshIndex.appendedThrough(spark, s"$root/idx") should be >= 0L
      // same source, same index — but a NEW checkpoint: batch ids
      // restart at 0 under a new query id; every batch would be
      // misclassified as a replay against the dead stream's marker
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        val schema = spark.read.parquet(s"$root/batches").schema
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/batches")
          .writeStream
          .foreachBatch(LshIndex.streamingDedupBatch(
            spark, s"$root/idx", "text", threshold = 0.5)((_, _) => ()))
          .option("checkpointLocation", s"$root/ckpt2")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      e.getCause.getMessage should include("misclassify")
    } finally delete(root)
  }
}
