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

  test("full lifecycle: stream → kill → remove → purge-compaction → resume SAME checkpoint → stream more") {
    // The production SEQUENCE, driven end-to-end through the real
    // engine in two sessions — pinning the interactions no single-op
    // spec covers: the append marker SURVIVES compactFrames' purge
    // restamp, the stream resumes after the compaction changed the
    // file set under the checkpoint, a takedown landing between
    // sessions scrubs the replayed batch's emission, and the final
    // index state equals a build that never saw the removed documents
    // but saw every streamed batch.
    val root = tmp()
    val rootRef = tmp()
    try {
      val removedIds = docs.filter(col("doc_id") >= 10 && col("doc_id") < 20)
        .select("doc_id")
      val survCorpus = docs.filter(
        col("doc_id") < 40 && !(col("doc_id") >= 10 && col("doc_id") < 20))
      val phase2 = docs.filter(col("doc_id") >= 60 && col("doc_id") < 80)
      LshIndex.build(spark, s"$root/idx", corpus, "text", "doc_id",
        shingleWidth = 1, numHashes = 8, numBands = 2)
      batch.select(col("doc_id"), col("text"))
        .repartition(2).write.parquet(s"$root/batches")
      runStream(spark, root) // batches 0, 1
      LshIndex.appendedThrough(spark, s"$root/idx") shouldBe 1L
      // the takedown must be load-bearing: the phase-1 emission pairs
      // with the to-be-removed docs, so the scrub below gates something
      val phase1Pairs = spark.read.parquet(s"$root/pairs")
      phase1Pairs.filter(col("id_a") >= 10 && col("id_a") < 20)
        .count() should be > 0L
      // kill after batch 1's fold-in, before its commit (the replayed
      // window), THEN a takedown and a purge-compaction land while the
      // stream is down — the operational window maintenance runs in
      delete(s"$root/ckpt/commits/1")
      LshIndex.remove(spark, s"$root/idx", removedIds)
      LshIndex.compactFrames(spark, s"$root/idx")
      // the purge restamped the meta and dropped the tombstones but
      // must NOT have touched the replay marker
      LshIndex.appendedThrough(spark, s"$root/idx") shouldBe 1L
      // phase-2 files arrive; the SAME checkpoint resumes in a new
      // session over the compacted index
      phase2.select(col("doc_id"), col("text"))
        .repartition(2).write.mode("append").parquet(s"$root/batches")
      val spark2 = spark.newSession()
      runStream(spark2, root) // replays 1, then folds 2, 3
      LshIndex.appendedThrough(spark, s"$root/idx") shouldBe 3L
      // the replayed batch's dir was rewritten under CURRENT truth:
      // the takedown scrubbed its emission (replay-after-remove
      // semantics, here through the real checkpoint machinery)
      spark.read.parquet(s"$root/pairs/batch=1")
        .filter(col("id_a") >= 10 && col("id_a") < 20)
        .count() shouldBe 0L
      // phase-2 emissions ≡ one-shot incremental of the phase-2 docs
      // against (survivor corpus ∪ phase-1) — the q109/q110 equality
      // held across kill + remove + compaction
      LshIndex.build(spark, s"$rootRef/idx", survCorpus, "text", "doc_id",
        shingleWidth = 1, numHashes = 8, numBands = 2)
      LshIndex.append(spark, s"$rootRef/idx", batch, "text")
      val (expP2, _) = LshIndex.incrementalPairs(
        LshIndex.load(spark, s"$rootRef/idx"), phase2, "text", threshold = 0.5)
      val gotP2 = spark.read.parquet(s"$root/pairs/batch=2")
        .unionByName(spark.read.parquet(s"$root/pairs/batch=3"))
      rows(expP2) should not be empty
      rows(gotP2) shouldBe rows(expP2)
      // final index frames ≡ a lifecycle that never saw the removed
      // docs but saw every streamed batch
      LshIndex.append(spark, s"$rootRef/idx", phase2, "text")
      val a = LshIndex.load(spark, s"$root/idx")
      val b = LshIndex.load(spark, s"$rootRef/idx")
      def dump(df: DataFrame): Seq[String] =
        df.collect().map(_.toString).sorted.toSeq
      dump(a.base) shouldBe dump(b.base)
      dump(a.banded) shouldBe dump(b.banded)
      def totals(df: DataFrame): Seq[String] = dump(
        df.groupBy(col("band_idx"), col("band_hash"))
          .agg(sum(col("bucket_n")).as("bucket_n")))
      totals(a.buckets) shouldBe totals(b.buckets)
    } finally { delete(root); delete(rootRef) }
  }

  test("full lifecycle, embedding side: SRP stream → kill → remove → purge → resume → stream more") {
    // the LSH lifecycle above, through SrpIndex's streaming face —
    // the two faces share IndexFiles/LshIncremental machinery but
    // each has its own append/compact/remove transactions, so the
    // sequence is pinned on both
    val root = tmp()
    val rootRef = tmp()
    try {
      val vecs = Tables(spark, sf, "embeddings")
      val corpusV = vecs.filter(col("vec_id") < 120)
      val phase1 = vecs.filter(col("vec_id") >= 120 && col("vec_id") < 200)
      val phase2 = vecs.filter(col("vec_id") >= 200 && col("vec_id") < 280)
      val removedIds = vecs.filter(col("vec_id") >= 10 && col("vec_id") < 40)
        .select("vec_id")
      val survCorpus = corpusV.filter(
        !(col("vec_id") >= 10 && col("vec_id") < 40))
      val (bands, planes, dims, thr) = (2, 4, 64, 0.3)
      graft.ext.SrpIndex.build(spark, s"$root/idx", corpusV,
        "vec_id", "embedding", bands, planes, dims)
      phase1.select(col("vec_id"), col("embedding"))
        .repartition(2).write.parquet(s"$root/batches")
      def runSrp(session: SparkSession): Unit = {
        val schema = session.read.parquet(s"$root/batches").schema
        val q = session.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/batches")
          .writeStream
          .foreachBatch(graft.ext.SrpIndex.streamingDedupBatch(
            session, s"$root/idx", threshold = thr)(
            (pairs, id) =>
              pairs.write.mode("overwrite").parquet(s"$root/pairs/batch=$id")))
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      runSrp(spark) // batches 0, 1
      graft.ext.SrpIndex.appendedThrough(spark, s"$root/idx") shouldBe 1L
      spark.read.parquet(s"$root/pairs")
        .filter(col("id_a") >= 10 && col("id_a") < 40)
        .count() should be > 0L // the takedown will be load-bearing
      delete(s"$root/ckpt/commits/1")
      graft.ext.SrpIndex.remove(spark, s"$root/idx", removedIds)
      graft.ext.SrpIndex.compactFrames(spark, s"$root/idx")
      graft.ext.SrpIndex.appendedThrough(spark, s"$root/idx") shouldBe 1L
      phase2.select(col("vec_id"), col("embedding"))
        .repartition(2).write.mode("append").parquet(s"$root/batches")
      runSrp(spark.newSession()) // replays 1, folds 2, 3
      graft.ext.SrpIndex.appendedThrough(spark, s"$root/idx") shouldBe 3L
      spark.read.parquet(s"$root/pairs/batch=1")
        .filter(col("id_a") >= 10 && col("id_a") < 40)
        .count() shouldBe 0L
      graft.ext.SrpIndex.build(spark, s"$rootRef/idx", survCorpus,
        "vec_id", "embedding", bands, planes, dims)
      graft.ext.SrpIndex.append(spark, s"$rootRef/idx", phase1)
      val (expP2, _) = graft.ext.SrpIndex.incrementalPairs(
        graft.ext.SrpIndex.load(spark, s"$rootRef/idx"), phase2,
        threshold = thr)
      val gotP2 = spark.read.parquet(s"$root/pairs/batch=2")
        .unionByName(spark.read.parquet(s"$root/pairs/batch=3"))
      rows(expP2) should not be empty
      rows(gotP2) shouldBe rows(expP2)
      graft.ext.SrpIndex.append(spark, s"$rootRef/idx", phase2)
      val a = graft.ext.SrpIndex.load(spark, s"$root/idx")
      val b = graft.ext.SrpIndex.load(spark, s"$rootRef/idx")
      def dump(df: DataFrame): Seq[String] =
        df.collect().map(_.toString).sorted.toSeq
      dump(a.base) shouldBe dump(b.base)
      dump(a.banded) shouldBe dump(b.banded)
      def totals(df: DataFrame): Seq[String] = dump(
        df.groupBy(col("band_idx"), col("bucket"))
          .agg(sum(col("bucket_n")).as("bucket_n")))
      totals(a.buckets) shouldBe totals(b.buckets)
    } finally { delete(root); delete(rootRef) }
  }

  /** Corpus labeling with the same params the streams use — the
    * store's production seed (and the from-scratch reference).
    */
  private def ccOf(d: DataFrame): DataFrame =
    graft.ext.DupClusters.componentsStar(
      graft.ext.Dedup.lshNearDupPairs(d, "text", "doc_id",
          shingleWidth = 1, numHashes = 8, numBands = 2, threshold = 0.5)
        .select(col("id_a").as("s"), col("id_b").as("t")),
      d.select(col("doc_id").as("id")))

  private def dumpSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("full lifecycle, label store: stream → kill → takedown (index + store) → compact both → resume → stream more") {
    // The composed streaming face (q115's operator) across the same
    // production sequence as the index lifecycle above — pinning what
    // no single-artifact test covers: the STORE's marker survives
    // LabelStore.compact, the resumed stream replays batch 1 with no
    // double fold on EITHER artifact, a takedown landing between
    // sessions flows through LabelStore.remove's re-election, and the
    // final persisted labeling equals a from-scratch CC that never saw
    // the removed docs but saw every streamed batch (the q114/q116
    // contract, held across a driver death + compactions).
    val root = tmp()
    try {
      val removedIds = docs.filter(col("doc_id") >= 10 && col("doc_id") < 20)
        .select("doc_id")
      val phase2 = docs.filter(col("doc_id") >= 60 && col("doc_id") < 80)
      LshIndex.build(spark, s"$root/idx", corpus, "text", "doc_id",
        shingleWidth = 1, numHashes = 8, numBands = 2)
      graft.ext.LabelStore.create(spark, s"$root/store", ccOf(corpus))
      batch.select(col("doc_id"), col("text"))
        .repartition(2).write.parquet(s"$root/batches")
      def runLabels(session: SparkSession): Unit = {
        val schema = session.read.parquet(s"$root/batches").schema
        val q = session.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/batches")
          .writeStream
          .foreachBatch(graft.ext.LabelStore.streamingLabelBatch(
            session, s"$root/idx", s"$root/store", "text", "doc_id",
            threshold = 0.5)((_, _) => ()))
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      runLabels(spark) // batches 0, 1
      graft.ext.LabelStore.appendedThrough(spark, s"$root/store") shouldBe 1L
      // the takedown must be load-bearing for the LABELING: removed
      // docs must currently sit in multi-member clusters
      graft.ext.LabelStore.load(spark, s"$root/store")
        .groupBy(col("label")).agg(count(lit(1)).as("n"),
          sum(when(col("id") >= 10 && col("id") < 20, 1L)
            .otherwise(0L)).as("nRem"))
        .filter(col("n") >= 2 && col("nRem") >= 1)
        .count() should be > 0L
      // kill in the replay window; takedown + compaction of BOTH
      // artifacts land while the stream is down
      delete(s"$root/ckpt/commits/1")
      LshIndex.remove(spark, s"$root/idx", removedIds)
      val idxView = LshIndex.load(spark, s"$root/idx")
      graft.ext.LabelStore.remove(spark, s"$root/store", removedIds, ids => {
        val (p, _) = LshIndex.pairsAmong(idxView, ids, threshold = 0.5)
        p.select(col("id_a").as("s"), col("id_b").as("t"))
      })
      LshIndex.compactFrames(spark, s"$root/idx")
      graft.ext.LabelStore.compact(spark, s"$root/store")
      // both markers survive their compactions
      LshIndex.appendedThrough(spark, s"$root/idx") shouldBe 1L
      graft.ext.LabelStore.appendedThrough(spark, s"$root/store") shouldBe 1L
      phase2.select(col("doc_id"), col("text"))
        .repartition(2).write.mode("append").parquet(s"$root/batches")
      runLabels(spark.newSession()) // replays 1, folds 2, 3
      graft.ext.LabelStore.appendedThrough(spark, s"$root/store") shouldBe 3L
      LshIndex.appendedThrough(spark, s"$root/idx") shouldBe 3L
      val survUnion = docs.filter(col("doc_id") < 80 &&
        !(col("doc_id") >= 10 && col("doc_id") < 20))
      dumpSorted(graft.ext.LabelStore.load(spark, s"$root/store")) shouldBe
        dumpSorted(ccOf(survUnion))
    } finally delete(root)
  }

  test("crash between index fold-in and store fold-in: the replay folds the store exactly once") {
    // The one window the composed face's exactly-once argument hinges
    // on (streamingLabelBatch scaladoc): the index fold lands, the
    // store fold does not, the batch replays. The index must classify
    // the batch as already-folded and reproduce its EXACT pairs by
    // subtraction; the store, whose marker does not yet cover it,
    // folds those pairs once. Driven manually (ManualWriter identity,
    // same resolveReplay path the stream takes).
    val root = tmp()
    try {
      LshIndex.build(spark, s"$root/idx", corpus, "text", "doc_id",
        shingleWidth = 1, numHashes = 8, numBands = 2)
      graft.ext.LabelStore.create(spark, s"$root/store", ccOf(corpus))
      val body = graft.ext.LabelStore.streamingLabelBatch(
        spark, s"$root/idx", s"$root/store", "text", "doc_id",
        threshold = 0.5)((_, _) => ())
      val b0 = docs.filter(col("doc_id") >= 40 && col("doc_id") < 50)
        .select(col("doc_id"), col("text"))
      val b1 = docs.filter(col("doc_id") >= 50 && col("doc_id") < 60)
        .select(col("doc_id"), col("text"))
      body(b0, 0L)
      // crash window: batch 1's INDEX fold lands, the store fold never
      // runs (the foreachBatch died between the two)
      LshIndex.streamingDedupBatch(spark, s"$root/idx", "text",
        threshold = 0.5)((_, _) => ())(b1, 1L)
      LshIndex.appendedThrough(spark, s"$root/idx") shouldBe 1L
      graft.ext.LabelStore.appendedThrough(spark, s"$root/store") shouldBe 0L
      // the replay completes the composition: store folds exactly once
      body(b1, 1L)
      graft.ext.LabelStore.appendedThrough(spark, s"$root/store") shouldBe 1L
      val after = dumpSorted(graft.ext.LabelStore.load(spark, s"$root/store"))
      after shouldBe dumpSorted(ccOf(docs.filter(col("doc_id") < 60)))
      // a batch BOTH markers cover replays as a pure no-op
      body(b1, 1L)
      LshIndex.appendedThrough(spark, s"$root/idx") shouldBe 1L
      graft.ext.LabelStore.appendedThrough(spark, s"$root/store") shouldBe 1L
      dumpSorted(graft.ext.LabelStore.load(spark, s"$root/store")) shouldBe after
    } finally delete(root)
  }

  test("auto-compaction cadence on the streaming label face keeps the log empty and the labeling exact") {
    // compactEveryOps = the runbook cadence rule, executable: every
    // second fold triggers a store compact; the labeling stays exact,
    // the marker survives each compaction, and a replay of a compacted
    // batch is still a no-op (the marker, not the log, is the replay
    // authority).
    val root = tmp()
    try {
      LshIndex.build(spark, s"$root/idx", corpus, "text", "doc_id",
        shingleWidth = 1, numHashes = 8, numBands = 2)
      graft.ext.LabelStore.create(spark, s"$root/store", ccOf(corpus))
      val body = graft.ext.LabelStore.streamingLabelBatch(
        spark, s"$root/idx", s"$root/store", "text", "doc_id",
        threshold = 0.5, compactEveryOps = 2)((_, _) => ())
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      def logExists: Boolean =
        fs.exists(new org.apache.hadoop.fs.Path(s"$root/store/deltas.parquet"))
      val slices = Seq((40L, 50L), (50L, 60L), (60L, 70L), (70L, 80L))
      slices.zipWithIndex.foreach { case ((lo, hi), i) =>
        body(docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .select(col("doc_id"), col("text")), i.toLong)
        graft.ext.LabelStore.appendedThrough(spark, s"$root/store") shouldBe
          i.toLong
        // ops 2 and 4 just compacted; odd ops may carry deltas
        if ((i + 1) % 2 == 0) logExists shouldBe false
      }
      dumpSorted(graft.ext.LabelStore.load(spark, s"$root/store")) shouldBe
        dumpSorted(ccOf(docs.filter(col("doc_id") < 80)))
      // a replayed batch whose deltas were compacted away is STILL a
      // no-op — the marker is the authority, not the log
      val before = dumpSorted(graft.ext.LabelStore.load(spark, s"$root/store"))
      body(docs.filter(col("doc_id") >= 70 && col("doc_id") < 80)
        .select(col("doc_id"), col("text")), 3L)
      dumpSorted(graft.ext.LabelStore.load(spark, s"$root/store")) shouldBe before
      graft.ext.LabelStore.appendedThrough(spark, s"$root/store") shouldBe 3L
    } finally delete(root)
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
