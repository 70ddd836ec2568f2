package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared sidecar-file protocol of the persisted index family
  * ([[LshIndex]], [[SrpIndex]], [[IvfIndex]]): the append marker and
  * the writer lease. One definition, so the three indexes cannot
  * drift on the two contracts that make concurrent/retrying writers
  * safe:
  *
  * '''Append marker''' (`_appended_through`): two lines — the highest
  * batch id folded in, and the WRITER IDENTITY that folded it (a
  * streaming query id, or [[ManualWriter]] for batch-API callers).
  * Identity is what makes the replay check sound: a marker only means
  * "batch id N is already in the index" to the SAME writer whose
  * batch numbering produced N. A restarted stream with a FRESH
  * checkpoint restarts batch ids at 0 while the old marker holds the
  * dead stream's high id — without the identity check every new batch
  * would be silently misclassified as a replay (never folded in,
  * cross-batch pairs lost, negative count deltas subtracted for docs
  * not in the index). With it, the mismatch is a hard error naming
  * the fix (rebuild the index, or resume the original checkpoint).
  *
  * Marker writes are MONOTONIC per identity: [[writeMarker]] records
  * `max(existing, new)`, so an out-of-order manual
  * `append(batchMarker = ...)` can never regress the marker and make
  * an already-folded batch look un-folded (a retry would then
  * double-append it — duplicate rows, inflated bucket counts).
  *
  * '''Writer lease''' (`_writer_lock`): best-effort single-writer
  * guard over index mutation. The index family's crash-safety
  * protocol (meta deleted first, rewritten last) makes a KILLED
  * writer safe, but two CONCURRENT writers interleaving meta deletes
  * can both "succeed" and leave frames from two different transactions
  * behind one meta. [[withWriterLease]] makes the second writer fail
  * loudly instead: create-exclusive lock file, age-based takeover (a
  * crashed writer's stale lock must not brick the index forever),
  * released in `finally`. Best-effort BY DESIGN — HDFS/local rename
  * and create-exclusive are atomic, object stores may be weaker; the
  * lease narrows the race to the takeover window rather than claiming
  * distributed-lock semantics it cannot have on every filesystem.
  */
private[graft] object IndexFiles {

  /** What a three-frame `compactFrames` did ([[LshIndex.compactFrames]]
    * / [[SrpIndex.compactFrames]]) — footer-verified numbers for the
    * two row-preserving rewrites (base, banded —
    * [[graft.ops.Compaction.Report]] enforces row parity), plus the
    * counts frame's file/row shrink (its ROWS change by design:
    * deltas aggregate to one per bucket, so parity there is
    * per-bucket-total equality, spec-pinned).
    */
  final case class FramesReport(base: graft.ops.Compaction.Report,
                                banded: graft.ops.Compaction.Report,
                                bucketFilesBefore: Int, bucketFilesAfter: Int,
                                bucketRowsBefore: Long, bucketRowsAfter: Long)

  /** Identity recorded by batch-API callers (no streaming query). */
  val ManualWriter = "manual"

  /** Lock older than this is presumed crashed and taken over. */
  val DefaultLeaseStaleMs: Long = 30L * 60 * 1000

  private def fsFor(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerPath(dir: String) = new Path(s"$dir/_appended_through")
  private def lockPath(dir: String) = new Path(s"$dir/_writer_lock")

  /** (highest folded batch id, writer identity), or None if no marked
    * append ever completed. A one-line legacy marker (pre-identity
    * layout) reads as [[ManualWriter]]. A corrupt marker is an
    * incomplete index — loud error, rebuild.
    *
    * MIGRATION NOTE (documented, deliberate): an index whose marker
    * was written by a pre-identity build reads as `manual`, so a
    * stream resuming it — even the original stream with its original
    * checkpoint — fails the identity check loudly and must rebuild
    * the index once. Adopting the resuming stream's identity lazily
    * was considered and REJECTED: the marker cannot distinguish the
    * legitimate original stream from a different stream with a fresh
    * checkpoint, and guessing wrong silently misclassifies batches —
    * the exact failure the identity exists to prevent. One loud
    * rebuild at upgrade beats a silent corruption path forever.
    */
  def readMarker(spark: SparkSession, dir: String): Option[(Long, String)] = {
    val p = markerPath(dir)
    val fs = fsFor(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val lines = text.split("\n", -1)
      val id = lines.head.trim.toLongOption.getOrElse(sys.error(
        s"index at $dir: _appended_through is corrupt " +
          s"('${lines.head.trim}') — the index is incomplete; rebuild it"))
      val writer = lines.drop(1).map(_.trim).find(_.nonEmpty)
        .getOrElse(ManualWriter)
      Some((id, writer))
    }
  }

  /** The highest batch id folded in; −1 if none. */
  def appendedThrough(spark: SparkSession, dir: String): Long =
    readMarker(spark, dir).map(_._1).getOrElse(-1L)

  /** Pre-flight identity check for a marked append — run BEFORE the
    * mutation transaction opens, so a mismatch is a clean refusal, not
    * a mid-transaction abort that leaves the index incomplete. Folding
    * marked batches from two different writers into one index makes
    * the replay check meaningless for both (their batch numberings are
    * unrelated), so the second writer must rebuild or adopt the
    * first's checkpoint, never silently mix.
    */
  def requireWriter(spark: SparkSession, dir: String, writer: String): Unit =
    readMarker(spark, dir).foreach { case (_, prevWriter) =>
      require(prevWriter == writer,
        s"index at $dir: _appended_through was written by '$prevWriter' " +
          s"but this append carries identity '$writer' — batch ids from " +
          "different writers are unrelated, so the replay check would " +
          "misclassify batches; rebuild the index (or resume the " +
          "original stream's checkpoint)")
    }

  /** Record a fold-in: `max(existing, batchId)` under `writer`'s
    * identity ([[requireWriter]] re-checked here as defense — callers
    * must have run it pre-transaction).
    */
  def writeMarker(spark: SparkSession, dir: String, batchId: Long,
                  writer: String): Unit = {
    requireWriter(spark, dir, writer)
    val id = math.max(
      readMarker(spark, dir).map(_._1).getOrElse(Long.MinValue), batchId)
    val p = markerPath(dir)
    val out = fsFor(spark, p).create(p, true)
    try out.write(s"$id\n$writer".getBytes("UTF-8"))
    finally out.close()
  }

  def deleteMarker(spark: SparkSession, dir: String): Unit = {
    val p = markerPath(dir)
    fsFor(spark, p).delete(p, false)
  }

  /** The streaming fold-in's identity + replay resolution — ONE
    * definition for every index family's `foreachBatch` body
    * ([[LshIndex.streamingDedupBatch]], [[SrpIndex.streamingDedupBatch]],
    * [[IvfIndex.streamingAppendBatch]]), because this is exactly the
    * logic a divergent copy would silently break: the writer identity
    * is the streaming query id (stable across restarts WITH the same
    * checkpoint — it is recorded in the checkpoint's metadata file —
    * and fresh with a fresh one; [[ManualWriter]] when no streaming
    * thread), a marker from a DIFFERENT writer is a hard error (its
    * batch numbering is unrelated — comparing against it would
    * misclassify every batch), and a batch is a replay iff OUR marker
    * already covers its id.
    *
    * @return (writerId, alreadyFolded)
    */
  def resolveReplay(spark: SparkSession, dir: String, label: String,
                    batchId: Long): (String, Boolean) = {
    val writerId = Option(spark.sparkContext
        .getLocalProperty("sql.streaming.queryId"))
      .getOrElse(ManualWriter)
    val marker = readMarker(spark, dir)
    marker.foreach { case (_, w) =>
      require(w == writerId,
        s"$label at $dir was folded into by writer '$w' but this " +
          s"stream is '$writerId' — their batch numberings are " +
          "unrelated, so resuming would misclassify batches; rebuild " +
          "the index, or restart from the original checkpoint " +
          "(index and checkpoint must be created/deleted together)")
    }
    (writerId, marker.exists(_._1 >= batchId))
  }

  /** Small-sidecar text IO shared by the index metas (hand-rolled flat
    * JSON, no library dependency): overwrite-create on write; on read,
    * a MISSING file is the caller's "incomplete index" message (the
    * meta-last protocol's completeness marker doing its job).
    */
  def writeTextFile(spark: SparkSession, path: String, text: String): Unit = {
    val p = new Path(path)
    val out = fsFor(spark, p).create(p, true)
    try out.write(text.getBytes("UTF-8"))
    finally out.close()
  }

  def readTextFile(spark: SparkSession, path: String,
                   missingMsg: => String): String = {
    val p = new Path(path)
    val fs = fsFor(spark, p)
    require(fs.exists(p), missingMsg)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** ATOMIC meta publish: write-to-temp + rename (the LabelStore
    * discipline, shared with the index family). A direct create() is
    * truncate-then-write, and a concurrent reader opening the file
    * between the two reads EMPTY meta and reports the index corrupt
    * (the index-family soak's second seam — IvfIndex hit it on the
    * first racing append). Writers hold the lease and delete the meta
    * first (the completeness-marker protocol), so the rename target
    * is normally absent; the defensive delete keeps the rename
    * overwrite-free on every Hadoop fs, and the tiny extra absence
    * window is exactly what [[readMetaFile]]'s live-lock diagnosis
    * covers.
    */
  def publishMetaFile(spark: SparkSession, path: String, text: String): Unit = {
    val tmp = s"$path.tmp"
    writeTextFile(spark, tmp, text)
    val p = new Path(path)
    val fs = fsFor(spark, p)
    fs.delete(p, false)
    require(fs.rename(new Path(tmp), p),
      s"meta rename failed at $path — left meta-less (incomplete) for " +
        "loud recovery, never half-written")
  }

  /** Read an index META file; when it is ABSENT, distinguish a
    * concurrent writer's mid-transaction window (live lock →
    * RETRYABLE refusal naming `_writer_lock`) from a genuinely
    * missing/crashed index (→ `missingMsg`, rebuild). The meta
    * delete IS the torn-write crash marker every index mutation
    * relies on, so absence alone cannot tell the two apart — the
    * lock's heartbeat liveness can (the LabelStore reader discipline
    * via [[lockAgeMs]], shared; the index-family concurrent soak
    * caught readers mis-diagnosing the swap window as a missing
    * index).
    */
  def readMetaFile(spark: SparkSession, dir: String, fileName: String,
                   missingMsg: => String,
                   staleMs: Long = DefaultLeaseStaleMs): String = {
    val p = new Path(s"$dir/$fileName")
    val fs = fsFor(spark, p)
    def diagnoseAbsent(): Nothing = {
      if (lockAgeMs(spark, dir).exists(_ <= staleMs))
        throw new IllegalArgumentException(
          s"index at $dir: $fileName absent while a concurrent writer " +
            "holds a live _writer_lock — a mutation's meta swap is in " +
            "flight; retry once it finishes")
      throw new IllegalArgumentException(missingMsg)
    }
    if (!fs.exists(p)) diagnoseAbsent()
    // TOCTOU: the meta can pass the exists probe and be deleted by a
    // concurrent writer's delete-before-rename publish before open —
    // re-run the same absence diagnosis instead of leaking the raw
    // FileNotFoundException (soak seam: the exists check alone isn't
    // atomic with the read).
    val in = try fs.open(p)
             catch { case _: java.io.FileNotFoundException => diagnoseAbsent() }
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Age of the writer lock at `dir`, if one exists: milliseconds
    * since its heartbeat timestamp (modification time when the
    * timestamp is mid-rewrite — the [[withWriterLease]] read
    * discipline), None when absent/vanished. The READER-side liveness
    * probe: a store whose meta is missing while a lock younger than
    * the stale threshold exists is in a live writer's swap window
    * (transient — wait), not crashed (permanent — fail).
    */
  def lockAgeMs(spark: SparkSession, dir: String): Option[Long] = {
    val p = lockPath(dir)
    val fs = fsFor(spark, p)
    try {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      Some(text.toLongOption.map(System.currentTimeMillis() - _)
        .getOrElse(System.currentTimeMillis() -
          fs.getFileStatus(p).getModificationTime))
    } catch { case _: java.io.IOException => None }
  }

  /** Run `body` holding the index's writer lease. A live concurrent
    * writer (lock younger than `staleMs`) fails loudly; a crashed
    * writer's stale lock is taken over. The lease is released in
    * `finally` — including when `body` throws, because the index
    * protocol already handles a failed mutation (no meta → refuses to
    * load → rebuild), and a lock surviving the failure would only
    * delay that recovery by `staleMs`.
    *
    * The holder HEARTBEATS: a daemon thread rewrites the lock's
    * timestamp every `staleMs / 3` while `body` runs, so a LIVE
    * long-running mutation (a corpus-scale compaction takes hours at
    * 100 TB) can never age past the takeover threshold — age-based
    * takeover fires only when the writer is genuinely dead and its
    * heartbeats have stopped. (Best-effort, like the lease itself: a
    * writer frozen longer than `staleMs` — not crashed, not
    * heartbeating — can still be taken over; filesystems without
    * atomic create-exclusive narrow to the same window.)
    */
  def withWriterLease[T](spark: SparkSession, dir: String, op: String,
                         staleMs: Long = DefaultLeaseStaleMs)(body: => T): T = {
    val p = lockPath(dir)
    val fs = fsFor(spark, p)
    def touch(exclusive: Boolean): Boolean =
      try {
        if (exclusive && (fs.getUri.getScheme == null ||
            fs.getUri.getScheme == "file")) {
          // Hadoop's local create(overwrite=false) is CHECK-then-create
          // — two simultaneous acquirers can both win and interleave
          // meta swaps (ConcurrentWriterSoakSpec caught exactly that as
          // a failed meta rename). POSIX O_CREAT|O_EXCL via
          // createNewFile IS atomic; HDFS keeps the fs.create path
          // below (its exclusive create is atomic server-side).
          val f = new java.io.File(p.toUri.getPath)
          Option(f.getParentFile).foreach(_.mkdirs())
          if (!f.createNewFile()) false
          else {
            val out = new java.io.FileOutputStream(f)
            try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
            finally out.close()
            true
          }
        } else {
          val out = fs.create(p, !exclusive)
          try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
          finally out.close()
          true
        }
      } catch { case _: java.io.IOException => false }
    if (!touch(exclusive = true)) {
      // Read discipline matters here: the holder's heartbeat rewrites
      // the file non-atomically (truncate, then write), so a lock that
      // EXISTS but reads empty/garbage means a writer is rewriting it
      // RIGHT NOW — but only while that writer is ALIVE. A writer
      // killed inside the truncate-write window leaves an empty lock
      // forever, so pinning unparsable to age 0 would brick the index
      // (takeover can never fire). The file's MODIFICATION TIME
      // disambiguates: a live rewrite just touched the file (age-by-
      // mtime ≈ 0, no takeover), a killed writer's empty lock has a
      // frozen mtime that ages past the threshold like any stale
      // lock. Only a VANISHED lock (open/stat throws) is a raced
      // release, retried as a fresh acquire.
      val ageMs =
        try {
          val in = fs.open(p)
          val text =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          Some(text.toLongOption.map(System.currentTimeMillis() - _)
            .getOrElse(System.currentTimeMillis() -
              fs.getFileStatus(p).getModificationTime))
        } catch { case _: java.io.IOException => None } // vanished: released
      val stale = ageMs.exists(_ > staleMs)
      val vanished = ageMs.isEmpty
      require(stale || vanished,
        s"$op at $dir: another writer holds _writer_lock " +
          s"(age ${ageMs.getOrElse(-1L)} ms < stale threshold $staleMs ms) — " +
          "index mutation is single-writer; wait for it to finish, or " +
          "delete the lock if you know the writer is dead")
      if (stale) fs.delete(p, false)
      require(touch(exclusive = true),
        s"$op at $dir: lost the takeover race for _writer_lock to another " +
          "writer — retry once the winner finishes")
    }
    val beat = new java.util.concurrent.ScheduledThreadPoolExecutor(1, r => {
      val t = new Thread(r, s"lease-heartbeat-$op")
      t.setDaemon(true)
      t
    })
    beat.scheduleAtFixedRate(() => touch(exclusive = false),
      math.max(1L, staleMs / 3), math.max(1L, staleMs / 3),
      java.util.concurrent.TimeUnit.MILLISECONDS)
    try body
    finally {
      beat.shutdownNow()
      fs.delete(p, false)
    }
  }

  /** The tombstone-purge rewrite shared by the three indexes'
    * compaction faces ([[LshIndex.compactFrames]],
    * [[SrpIndex.compactFrames]], [[IvfIndex.compactAssignments]]) —
    * ONE definition for the block a divergent copy would silently
    * break: census the source, anti-join the broadcast tombstones
    * out, size the output files to the SURVIVING bytes (double
    * arithmetic — `bytes × survivors` overflows a Long at the 100 TB
    * design point), and return a footer-verified
    * [[graft.ops.Compaction.Report]] whose `rowsBefore` carries the
    * SURVIVING pre-rewrite count, so its embedded parity require
    * becomes the purge check (survivors in == rows out).
    */
  def purgeRewrite(spark: SparkSession, srcDir: String, tmpDir: String,
                   tombDir: String, idColName: String,
                   targetFileBytes: Long): graft.ops.Compaction.Report = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val (f0, g0, r0, b0) = graft.ops.Compaction.census(spark, srcDir)
    val tomb = broadcast(spark.read.parquet(tombDir)
      .withColumnRenamed("id", idColName))
    val df = spark.read.parquet(srcDir)
    val removed = df.join(tomb, Seq(idColName), "left_semi").count()
    val survivors = r0 - removed
    val keptBytes =
      if (r0 == 0) 0L else (b0.toDouble * survivors / r0).toLong
    val nOut = math.max(1L,
      (keptBytes + targetFileBytes - 1) / targetFileBytes).toInt
    df.join(tomb, Seq(idColName), "left_anti").coalesce(nOut)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmpDir)
    val (f1, g1, r1, b1) = graft.ops.Compaction.census(spark, tmpDir)
    graft.ops.Compaction.Report(srcDir, tmpDir, f0, f1, g0, g1,
      survivors, r1, b0, b1)
  }
}
