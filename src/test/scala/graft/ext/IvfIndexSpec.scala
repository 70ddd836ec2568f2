package graft.ext

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** IVF index persistence: a saved+loaded index must serve searches
  * bit-identically to the fresh in-session index, partial writes must
  * not load, and loadOrTrain must train exactly once.
  */
class IvfIndexSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf, "embeddings")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ivfidx_").toString

  private def delete(root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def freshIndex(): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val centroids = Similarity.kmeansTrain(
      emb, emb.filter(col("vec_id") < 8), iters = 2, dims = 64)
    (centroids, Similarity.assignToCentroids(emb, centroids))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("query_id", "rank").collect().map(_.toString).toSeq

  test("search over a loaded index is bit-identical to the fresh index") {
    val root = tmp()
    try {
      val (centroids, assigned) = freshIndex()
      val fresh = Similarity.ivfKnnPreassigned(
        assigned, centroids, emb.filter(col("vec_id") < 3), k = 5, nprobe = 2)
      IvfIndex.save(spark, s"$root/idx", centroids, Some(assigned))
      val loaded = IvfIndex.load(spark, s"$root/idx")
      loaded.assignments.isDefined shouldBe true
      val served = IvfIndex.search(loaded, emb.filter(col("vec_id") < 3),
        k = 5, nprobe = 2)
      rows(served) shouldBe rows(fresh)
    } finally delete(root)
  }

  test("an index saved without assignments searches via the corpus") {
    val root = tmp()
    try {
      val (centroids, assigned) = freshIndex()
      IvfIndex.save(spark, s"$root/idx", centroids, None)
      val loaded = IvfIndex.load(spark, s"$root/idx")
      loaded.assignments shouldBe None
      // no corpus → explicit error, not a null-pointer deep in the plan
      val e = intercept[RuntimeException] {
        IvfIndex.search(loaded, emb.filter(col("vec_id") < 3), 5, 2)
      }
      e.getMessage should include("pass the corpus")
      val served = IvfIndex.search(loaded, emb.filter(col("vec_id") < 3),
        k = 5, nprobe = 2, corpus = Some(emb))
      rows(served) shouldBe rows(Similarity.ivfKnnPreassigned(
        assigned, centroids, emb.filter(col("vec_id") < 3), k = 5, nprobe = 2))
    } finally delete(root)
  }

  test("a partial index (no meta) does not load; loadOrTrain trains over it") {
    val root = tmp()
    try {
      val (centroids, _) = freshIndex()
      // simulate a killed writer: parquet present, meta never written
      centroids.write.parquet(s"$root/idx/centroids.parquet")
      val e = intercept[IllegalArgumentException] {
        IvfIndex.load(spark, s"$root/idx")
      }
      e.getMessage should include("missing/incomplete")
      val idx = IvfIndex.loadOrTrain(spark, s"$root/idx") {
        (centroids, None)
      }
      idx.centroids.count() shouldBe centroids.count()
    } finally delete(root)
  }

  test("loadOrTrain serves from the cache: the train closure must not re-run") {
    val root = tmp()
    try {
      val (centroids, assigned) = freshIndex()
      IvfIndex.loadOrTrain(spark, s"$root/idx")((centroids, Some(assigned)))
      val idx = IvfIndex.loadOrTrain(spark, s"$root/idx") {
        sys.error("cache hit expected: train closure must not re-run")
      }
      idx.idCol shouldBe "vec_id"
      idx.assignments.isDefined shouldBe true
    } finally delete(root)
  }

  test("loadOrTrain retrains over an older-format index, refuses a newer one") {
    val root = tmp()
    try {
      val (centroids, _) = freshIndex()
      IvfIndex.save(spark, s"$root/idx", centroids, None)
      val meta = new org.apache.hadoop.fs.Path(s"$root/idx/_ivf_meta.json")
      val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def stampVersion(v: Int): Unit = {
        val out = fs.create(meta, true)
        out.write(s"""{"version":$v,"idCol":"vec_id","vecCol":"embedding","hasAssignments":false}"""
          .getBytes("UTF-8"))
        out.close()
      }
      // OLDER version = cache miss: the train closure runs (upgrade path)
      stampVersion(0)
      var trained = false
      val idx = IvfIndex.loadOrTrain(spark, s"$root/idx") {
        trained = true; (centroids, None)
      }
      trained shouldBe true
      idx.centroids.count() shouldBe centroids.count()
      // NEWER version = refusal: never clobber a newer build's artifact
      stampVersion(99)
      val e = intercept[IllegalArgumentException] {
        IvfIndex.loadOrTrain(spark, s"$root/idx")(sys.error("must not train"))
      }
      e.getMessage should include("newer")
    } finally delete(root)
  }

  test("a truncated meta is an incomplete index: loadOrTrain retrains, load explains") {
    val root = tmp()
    try {
      val (centroids, _) = freshIndex()
      IvfIndex.save(spark, s"$root/idx", centroids, None)
      // simulate a writer killed mid-meta-write: file exists, truncated
      val p = new org.apache.hadoop.fs.Path(s"$root/idx/_ivf_meta.json")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      out.write("""{"version":1,"idC""".getBytes("UTF-8"))
      out.close()
      // load: explicit incomplete-index message, not "missing field"
      val e = intercept[RuntimeException] { IvfIndex.load(spark, s"$root/idx") }
      e.getMessage should include("truncated/corrupt")
      // loadOrTrain: cache miss → retrain, and the rewritten index loads
      var trained = false
      val idx = IvfIndex.loadOrTrain(spark, s"$root/idx") {
        trained = true; (centroids, None)
      }
      trained shouldBe true
      idx.centroids.count() shouldBe centroids.count()
      IvfIndex.load(spark, s"$root/idx").centroids.count() shouldBe centroids.count()
    } finally delete(root)
  }

  test("re-saving without assignments removes the stale assignments artifact") {
    val root = tmp()
    try {
      val (centroids, assigned) = freshIndex()
      IvfIndex.save(spark, s"$root/idx", centroids, Some(assigned))
      val aPath = new org.apache.hadoop.fs.Path(s"$root/idx/assignments.parquet")
      val fs = aPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(aPath) shouldBe true
      // the older-format-retrain path: new save has no assignments —
      // the corpus-sized dir must not be silently retained
      IvfIndex.save(spark, s"$root/idx", centroids, None)
      fs.exists(aPath) shouldBe false
      IvfIndex.load(spark, s"$root/idx").assignments shouldBe None
    } finally delete(root)
  }

  test("append folds new vectors in: serve == assigning corpus and batch together") {
    val root = tmp()
    try {
      val corpus = emb.filter(col("vec_id") < 200)
      val batch = emb.filter(col("vec_id") >= 200)
      val centroids = Similarity.kmeansTrain(
        corpus, corpus.filter(col("vec_id") < 8), iters = 2, dims = 64)
      IvfIndex.save(spark, s"$root/idx", centroids,
        Some(Similarity.assignToCentroids(corpus, centroids)))
      IvfIndex.append(spark, s"$root/idx", batch)
      val served = IvfIndex.search(IvfIndex.load(spark, s"$root/idx"),
        emb.filter(col("vec_id") < 3), k = 5, nprobe = 2)
      // the contract: exactly as if corpus ∪ batch had been assigned
      // together against the SAME (corpus-trained) centroids
      val together = Similarity.ivfKnnPreassigned(
        Similarity.assignToCentroids(emb, centroids), centroids,
        emb.filter(col("vec_id") < 3), k = 5, nprobe = 2)
      rows(served) shouldBe rows(together)
    } finally delete(root)
  }

  test("append refuses an assignments-free index") {
    val root = tmp()
    try {
      val (centroids, _) = freshIndex()
      IvfIndex.save(spark, s"$root/idx", centroids, None)
      val e = intercept[IllegalArgumentException] {
        IvfIndex.append(spark, s"$root/idx", emb.filter(col("vec_id") >= 400))
      }
      e.getMessage should include("without assignments")
    } finally delete(root)
  }

  test("save rejects column names the flat meta cannot represent") {
    val root = tmp()
    try {
      val (centroids, _) = freshIndex()
      val e = intercept[IllegalArgumentException] {
        IvfIndex.save(spark, s"$root/idx",
          centroids.withColumnRenamed("vec_id", "a\"b"), None, idCol = "a\"b")
      }
      e.getMessage should include("quote/backslash")
    } finally delete(root)
  }

  test("a future format version is rejected, not misread") {
    val root = tmp()
    try {
      val (centroids, _) = freshIndex()
      IvfIndex.save(spark, s"$root/idx", centroids, None)
      // overwrite meta with a bumped version
      val p = new org.apache.hadoop.fs.Path(s"$root/idx/_ivf_meta.json")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      out.write("""{"version":99,"idCol":"vec_id","vecCol":"embedding","hasAssignments":false}""".getBytes("UTF-8"))
      out.close()
      val e = intercept[IllegalArgumentException] {
        IvfIndex.load(spark, s"$root/idx")
      }
      e.getMessage should include("format version 99")
    } finally delete(root)
  }

  test("compactAssignments bounds the appended file growth; search identical") {
    val root = tmp()
    try {
      val (centroids, assigned) = freshIndex()
      IvfIndex.save(spark, s"$root/idx", centroids, Some(assigned))
      (0 until 4).foreach { i =>
        IvfIndex.append(spark, s"$root/idx",
          emb.filter(col("vec_id") % 4 === i)
            .withColumn("vec_id", col("vec_id") + 10000 * (i + 1)))
      }
      def files(): Int = new java.io.File(s"$root/idx/assignments.parquet")
        .listFiles().count(f => f.isFile && !f.getName.startsWith(".")
          && !f.getName.startsWith("_"))
      val before = rows(IvfIndex.search(IvfIndex.load(spark, s"$root/idx"),
        emb.filter(col("vec_id") < 3), k = 5, nprobe = 2))
      val filesBefore = files()
      filesBefore should be > 4 // growth actually happened
      val report = IvfIndex.compactAssignments(spark, s"$root/idx")
      report.filesAfter should be < filesBefore
      files() shouldBe report.filesAfter
      // row-parity enforced by the Report; search equality pinned here
      rows(IvfIndex.search(IvfIndex.load(spark, s"$root/idx"),
        emb.filter(col("vec_id") < 3), k = 5, nprobe = 2)) shouldBe before
      // drift counters and marker untouched by layout maintenance
      IvfIndex.driftStat(spark, s"$root/idx").appendedN should be > 0L
    } finally delete(root)
  }

  test("remove: a taken-down vector never comes back as a neighbor; purge physical") {
    val root = tmp()
    try {
      val (centroids, assigned) = freshIndex()
      IvfIndex.save(spark, s"$root/idx", centroids, Some(assigned))
      val q = emb.filter(col("vec_id") < 3)
      val before = IvfIndex.search(IvfIndex.load(spark, s"$root/idx"),
        q, k = 5, nprobe = 2)
      // remove the top neighbors of query 0: they must vanish from
      // results, displaced by the next-best survivors
      val victims = before.filter(col("query_id") === 0 && col("rank") <= 2)
        .select(col("neighbor_id").as("vec_id"))
      val victimIds = victims.collect().map(_.getLong(0)).toSet
      IvfIndex.remove(spark, s"$root/idx", victims)
      val after = IvfIndex.search(IvfIndex.load(spark, s"$root/idx"),
        q, k = 5, nprobe = 2)
      after.select("neighbor_id").collect().map(_.getLong(0))
        .toSet.intersect(victimIds) shouldBe Set.empty
      after.filter(col("query_id") === 0).count() shouldBe 5L // backfilled
      // idempotent retry, then physical purge: tombstones gone, rows
      // gone, search unchanged
      IvfIndex.remove(spark, s"$root/idx", victims)
      val afterRows = rows(after)
      val report = IvfIndex.compactAssignments(spark, s"$root/idx")
      new java.io.File(s"$root/idx/tombstones.parquet").exists() shouldBe false
      val idx = IvfIndex.load(spark, s"$root/idx")
      idx.assignments.get.filter(col("vec_id").isin(victimIds.toSeq: _*))
        .count() shouldBe 0L
      report.rowsAfter shouldBe idx.assignments.get.count()
      rows(IvfIndex.search(idx, q, k = 5, nprobe = 2)) shouldBe afterRows
    } finally delete(root)
  }

  // ---- drift statistic --------------------------------------------

  /** Constructed drift fixture: corpus hugs axis e0, a second cluster
    * hugs e1 (the two centroids), and the DRIFTED batch sits on e2 —
    * orthogonal to every centroid, so its assignment distance is ~1
    * regardless of which centroid wins. Deterministic by construction.
    */
  private def axisVecs(ids: Range, axis: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    ids.map { i =>
      val v = Array.fill(4)(0.0)
      v(axis) = 1.0
      v((axis + 1) % 4) = 0.001 * (i % 7) // tiny per-id wobble
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("driftStat: save writes the train baseline, appends fold in O(batch)") {
    val root = tmp()
    try {
      val corpus = axisVecs(0 until 20, 0).union(axisVecs(20 until 40, 1))
      val centroids = axisVecs(0 until 1, 0).union(axisVecs(1 until 2, 1))
        .withColumn("vec_id", col("vec_id") * 1) // ids 0, 1
      IvfIndex.save(spark, s"$root/idx", centroids,
        Some(Similarity.assignToCentroids(corpus, centroids)))
      val s0 = IvfIndex.driftStat(spark, s"$root/idx")
      s0.trainN shouldBe 40L
      s0.appendedN shouldBe 0L
      s0.appendedMeanDist shouldBe None
      s0.appendedFraction shouldBe 0.0
      s0.trainMeanDist should be < 0.01 // corpus hugs its centroids
      // an IN-DISTRIBUTION append: ratio stays ~1
      IvfIndex.append(spark, s"$root/idx", axisVecs(100 until 120, 0))
      val s1 = IvfIndex.driftStat(spark, s"$root/idx")
      s1.appendedN shouldBe 20L
      s1.appendedFraction shouldBe 20.0 / 60.0
      s1.ratio.get should be < 3.0 // same tiny-wobble population
      // a DRIFTED append (orthogonal cluster): the ratio explodes while
      // the train baseline stays fixed — the silent-recall-decay signal
      IvfIndex.append(spark, s"$root/idx", axisVecs(200 until 220, 2))
      val s2 = IvfIndex.driftStat(spark, s"$root/idx")
      s2.trainMeanDist shouldBe s0.trainMeanDist // baseline never moves
      s2.appendedN shouldBe 40L
      s2.ratio.get should be > 50.0 // e2 sits at distance ~1 from both
      // counters survive the meta rewrite cycle exactly: re-reading
      // agrees with what the appends folded in
      IvfIndex.driftStat(spark, s"$root/idx") shouldBe s2
    } finally delete(root)
  }

  test("retrainIfDrifted: below threshold untouched; past it retrains on " +
       "the survivor corpus, re-arms the dial, serves the drifted mass") {
    val root = tmp()
    try {
      val corpus = axisVecs(0 until 20, 0).union(axisVecs(20 until 40, 1))
      val centroids = axisVecs(0 until 1, 0).union(axisVecs(1 until 2, 1))
      IvfIndex.save(spark, s"$root/idx", centroids,
        Some(Similarity.assignToCentroids(corpus, centroids)))
      def train(c0: org.apache.spark.sql.DataFrame) = {
        // kmeansTrain consumes float vectors; the survivor corpus view
        // serves array<double> (the save-time cast)
        val c = c0.withColumn("embedding",
          col("embedding").cast("array<float>"))
        val cents = Similarity.kmeansTrain(c,
          c.filter(col("vec_id").isin(0L, 20L, 200L)), iters = 2, dims = 4)
        (cents, Some(Similarity.assignToCentroids(c, cents)))
      }
      // nothing appended: stat has no ratio, never fires
      val r0 = IvfIndex.retrainIfDrifted(spark, s"$root/idx")(c =>
        fail("train closure must not run below threshold"))
      r0.retrained shouldBe false
      r0.stat.get.appendedMeanDist shouldBe None
      // in-distribution append: ratio ~1 < 2, untouched
      IvfIndex.append(spark, s"$root/idx", axisVecs(100 until 120, 0))
      val statBefore = IvfIndex.driftStat(spark, s"$root/idx")
      val r1 = IvfIndex.retrainIfDrifted(spark, s"$root/idx")(c =>
        fail("train closure must not run below threshold"))
      r1.retrained shouldBe false
      IvfIndex.driftStat(spark, s"$root/idx") shouldBe statBefore
      // drifted append (orthogonal cluster): ratio explodes, FIRES
      IvfIndex.append(spark, s"$root/idx", axisVecs(200 until 220, 2))
      val r2 = IvfIndex.retrainIfDrifted(spark, s"$root/idx")(train)
      r2.retrained shouldBe true
      r2.stat.get.ratio.get should be > 2.0
      // the dial re-armed: fresh train baseline covers ALL 80 vectors,
      // nothing counted as appended anymore
      val after = IvfIndex.driftStat(spark, s"$root/idx")
      after.trainN shouldBe 80L
      after.appendedN shouldBe 0L
      after.ratio shouldBe None
      // the retrained index actually serves the drifted population:
      // a query in the drifted cluster finds its own neighbors
      val idx = IvfIndex.load(spark, s"$root/idx")
      val got = IvfIndex.search(idx, axisVecs(200 until 201, 2), k = 5,
          nprobe = 1).select("neighbor_id")
        .collect().map(_.getLong(0)).toSet
      got.subsetOf((200L until 220L).toSet) shouldBe true
      got should have size 5
    } finally delete(root)
  }

  test("streamingAppendBatch folds exactly once; replay skips, stats fire every batch") {
    val root = tmp()
    try {
      val corpus = axisVecs(0 until 20, 0).union(axisVecs(20 until 40, 1))
      val centroids = axisVecs(0 until 1, 0).union(axisVecs(1 until 2, 1))
      IvfIndex.save(spark, s"$root/idx", centroids,
        Some(Similarity.assignToCentroids(corpus, centroids)))
      val stats = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val body = IvfIndex.streamingAppendBatch(spark, s"$root/idx")(
        (stat, id) => stats += ((id, stat.get.appendedN)))
      body(axisVecs(100 until 110, 0), 0L)
      body(axisVecs(200 until 212, 1), 1L)
      IvfIndex.appendedThrough(spark, s"$root/idx") shouldBe 1L
      stats.toSeq shouldBe Seq((0L, 10L), (1L, 22L))
      val rowsAfter = IvfIndex.load(spark, s"$root/idx")
        .assignments.get.count()
      // crash-replay of batch 1: the fold-in is skipped (marker proves
      // it already happened), but the stats sink still sees the batch
      body(axisVecs(200 until 212, 1), 1L)
      IvfIndex.load(spark, s"$root/idx").assignments.get.count() shouldBe rowsAfter
      stats.toSeq shouldBe Seq((0L, 10L), (1L, 22L), (1L, 22L))
      // a different stream identity against this marker is a hard error
      val sc = spark.sparkContext
      sc.setLocalProperty("sql.streaming.queryId", "stream-X")
      try intercept[IllegalArgumentException] {
        body(axisVecs(300 until 310, 0), 0L)
      }.getMessage should include("misclassify")
      finally sc.setLocalProperty("sql.streaming.queryId", null)
    } finally delete(root)
  }

  test("driftStat is explicit when the index carries no counters") {
    val root = tmp()
    try {
      val (centroids, _) = freshIndex()
      IvfIndex.save(spark, s"$root/idx", centroids, None)
      val e = intercept[RuntimeException] {
        IvfIndex.driftStat(spark, s"$root/idx")
      }
      e.getMessage should include("no drift counters")
    } finally delete(root)
  }

  test("driftStatOption degrades to None on a trainN=0 baseline; driftStat throws") {
    val root = tmp()
    try {
      import spark.implicits._
      // all-zero train vectors: every train cosine is null, so the
      // counters are PRESENT but trainN=0. The automated face
      // (consumed by streamingAppendBatch after every fold-in) must
      // degrade to "no stat", never crash-loop the stream; the
      // interactive face keeps the diagnosing throw.
      val zeros = (0 until 4).map(i => (i.toLong, Seq.fill(4)(0.0)))
        .toDF("vec_id", "embedding")
      val centroids = axisVecs(0 until 2, 0)
      IvfIndex.save(spark, s"$root/idx", centroids,
        Some(Similarity.assignToCentroids(zeros, centroids)))
      IvfIndex.driftStatOption(spark, s"$root/idx") shouldBe None
      intercept[IllegalArgumentException] {
        IvfIndex.driftStat(spark, s"$root/idx")
      }.getMessage should include("trainN=0")
    } finally delete(root)
  }
}
