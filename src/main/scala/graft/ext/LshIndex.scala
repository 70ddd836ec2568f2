package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH corpus index — the "shingle once, dedup every
  * batch" production shape behind [[Dedup.lshNearDupPairs]]: at corpus
  * scale the expensive passes are shingling + the md5 signature battery
  * and the banded self-join, so the signature-derived frames are built
  * ONCE, persisted to parquet, and every arriving batch runs
  * [[incrementalPairs]] against them — O(batch) work plus three
  * map-side corpus-frame scans, no corpus re-shingling, no corpus-side
  * shuffle, no corpus×corpus pair regeneration (see
  * [[Dedup.lshNearDupPairsIncrementalFrames]] for the per-stage
  * argument). [[append]] then folds the deduped batch into the index so
  * the next batch sees it as corpus.
  *
  * Same compute-once-reload contract as the S8 parquet cache
  * (`processors/_impl/plotting_impl.py:126-147`,
  * [[graft.sinks.Exporters.cached]]) and [[IvfIndex]], applied to a
  * three-frame artifact:
  *
  * {{{
  *   <path>/_lsh_meta.json     format version + banding params + payload
  *   <path>/base.parquet       (id, payload)  — verify payload per doc
  *   <path>/banded.parquet     (id, band_idx, band_hash)
  *   <path>/buckets.parquet    (band_idx, band_hash, bucket_n)
  * }}}
  *
  * `buckets.parquet` is what keeps the skew-guard O(batch): union
  * bucket totals come from stored counts + the batch's counts, never
  * from re-counting corpus rows. The meta file is written LAST and
  * deleted FIRST on any mutation ([[build]] overwrite, [[append]]), so
  * a killed writer always leaves the index marked incomplete rather
  * than internally inconsistent — the same crash-safety protocol as
  * [[IvfIndex]].
  *
  * Caller contract: document ids are unique across the corpus and every
  * batch (the index never re-checks — a batch-vs-corpus id collision
  * would silently merge two documents' band rows); batches are shingled
  * with the INDEX's params, enforced by reading them from the meta.
  */
object LshIndex {

  /** Bumped on layout changes; [[load]] rejects indexes written by a
    * different layout rather than misreading them. v2: the counts
    * frame is append-only DELTA rows — possibly several (and, in a
    * replay view, negative) rows per bucket, summed by readers — so
    * [[append]] is O(batch) instead of rewriting the counts frame
    * per fold-in. (v1's aggregated rows are a valid v2 state, but a
    * v1 READER would fan out on delta rows, hence the bump.)
    */
  val FormatVersion = 2

  /** Stamped into the meta by [[remove]] (and stamped back to
    * [[FormatVersion]] when [[compactFrames]] purges): a tombstoned
    * index has DIFFERENT read semantics — a reader that does not
    * apply the tombstone anti-join would silently serve removed
    * documents, the exact takedown violation [[remove]] exists to
    * prevent — so the version changes WITH the layout, and a
    * pre-tombstone build refuses the index loudly instead of
    * misreading it. v3 ≡ "v2 + tombstones.parquet".
    */
  val TombstoneVersion = FormatVersion + 1

  private def requireReadable(meta: Meta, path: String): Unit =
    require(meta.version == FormatVersion || meta.version == TombstoneVersion,
      s"LshIndex at $path has format version ${meta.version}; this build " +
        s"reads $FormatVersion (and $TombstoneVersion = tombstoned)")

  final case class Index(base: DataFrame, banded: DataFrame,
                         buckets: DataFrame,
                         idCol: String, shingleWidth: Int,
                         numHashes: Int, numBands: Int,
                         verifyOn: Dedup.VerifyOn)

  private final case class Meta(version: Int, idCol: String,
                                shingleWidth: Int, numHashes: Int,
                                numBands: Int, payload: String)

  // forward mapping is THE shared one (Dedup.payloadColumn) so the
  // persisted base column can never drift from what the verify stage
  // reads; only the meta-string reverse mapping lives here
  private def payloadCol(verifyOn: Dedup.VerifyOn): String =
    Dedup.payloadColumn(verifyOn)
  private def payloadVerifyOn(payload: String): Dedup.VerifyOn = payload match {
    case "sh" => Dedup.VerifyOn.Shingles
    case "h1" => Dedup.VerifyOn.HashSets
    case other => sys.error(s"LshIndex meta: unknown payload '$other'")
  }

  /** Build (or overwrite) the index at `path` from `df`'s `textCol`.
    * One corpus pass: shingle → signature battery → band explode,
    * then the three frames written; the banded self-join is NOT run —
    * corpus-internal pairs are the build-time caller's business
    * ([[Dedup.lshNearDupPairs]] over the same frame), this artifact
    * exists for the batches that follow.
    */
  def build(spark: SparkSession, path: String, df: DataFrame,
            textCol: String, idCol: String = "doc_id",
            shingleWidth: Int = 1, numHashes: Int = 24, numBands: Int = 3,
            verifyOn: Dedup.VerifyOn = Dedup.VerifyOn.HashSets): Unit = {
    require(!idCol.exists(c => c == '"' || c == '\\'),
      s"LshIndex.build: idCol '$idCol' contains a quote/backslash — not " +
        "representable in the index meta; rename the column before building")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (base, banded) = Dedup.bandedFrame(df, textCol, idCol,
      shingleWidth, numHashes, numBands, verifyOn)
    try IndexFiles.withWriterLease(spark, path, "LshIndex.build") {
      // meta deleted first: a killed rewrite leaves the index
      // incomplete (no meta), never old-meta-over-new-frames. A
      // leftover temp dir from a killed compaction is also
      // cleared — rebuild is the documented recovery path, so build
      // owns that cleanup — and so is the streaming replay marker: a
      // REBUILT index contains none of the streamed batches, so a
      // stale marker would make a restarted stream silently skip
      // folding them back in (their cross-batch pairs lost forever)
      fs.delete(new Path(s"$path/_lsh_meta.json"), false)
      Frames.foreach(f => fs.delete(new Path(s"$path/$f.tmp"), true))
      IndexFiles.deleteMarker(spark, path)
      // a rebuilt corpus has no removals — a stale tombstone frame
      // would silently hide freshly-indexed documents that share ids
      fs.delete(new Path(s"$path/$Tombstones"), true)
      base.select(col("id"), col(payloadCol(verifyOn)))
        .write.mode(SaveMode.Overwrite).parquet(s"$path/base.parquet")
      banded.write.mode(SaveMode.Overwrite).parquet(s"$path/banded.parquet")
      banded.groupBy(col("band_idx"), col("band_hash"))
        .agg(count(lit(1)).as("bucket_n"))
        .write.mode(SaveMode.Overwrite).parquet(s"$path/buckets.parquet")
      writeMeta(spark, s"$path/_lsh_meta.json",
        Meta(FormatVersion, idCol, shingleWidth, numHashes, numBands,
          payloadCol(verifyOn)))
    } finally {
      base.unpersist()
      banded.unpersist()
    }
  }

  /** The three persisted frame directories, in swap order. */
  private val Frames = Seq("base.parquet", "banded.parquet", "buckets.parquet")

  /** Load a built index. Fails with an explicit message on a missing /
    * incomplete index or a format-version mismatch.
    *
    * Tombstone semantics ([[remove]]): when a tombstone frame exists,
    * the returned base/banded frames carry a broadcast anti-join
    * against it — removed documents are invisible to every reader
    * (incremental pairs, the streaming fold-in, append≡rebuild
    * comparisons) while staying map-side (no corpus shuffle; the
    * tombstone set is broadcast — it is ids only and [[compactFrames]]
    * purges it physically, so it stays small by maintenance contract).
    * The counts frame needs no join: [[remove]] already appended the
    * removed documents' buckets as negative deltas.
    */
  def load(spark: SparkSession, path: String): Index = {
    val meta = readMeta(spark, s"$path/_lsh_meta.json")
    requireReadable(meta, path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (base, banded) = {
      val b = spark.read.parquet(s"$path/base.parquet")
      val bd = spark.read.parquet(s"$path/banded.parquet")
      if (!fs.exists(new Path(s"$path/$Tombstones"))) (b, bd)
      else {
        val tomb = broadcast(spark.read.parquet(s"$path/$Tombstones"))
        (b.join(tomb, Seq("id"), "left_anti"),
          bd.join(tomb, Seq("id"), "left_anti"))
      }
    }
    Index(base, banded,
      spark.read.parquet(s"$path/buckets.parquet"),
      meta.idCol, meta.shingleWidth, meta.numHashes, meta.numBands,
      payloadVerifyOn(meta.payload))
  }

  private val Tombstones = "tombstones.parquet"

  /** Take documents DOWN (the 100 TB compliance face — takedowns /
    * right-to-be-forgotten must not force a corpus re-index): append
    * the ids to the tombstone frame and their band buckets' NEGATIVE
    * count deltas, both O(removed) by the delta-counts layout — one
    * map-side semi-filtered scan of the banded frame computes the
    * deltas, nothing corpus-sized is rewritten. After remove,
    * [[load]] + every reader behave as if the documents had never
    * been indexed (spec-pinned ≡ rebuild-without; oracle-gated by
    * q112 including cap interaction — a bucket the removed documents
    * pushed over the cap can drop back under it, resurrecting its
    * surviving pairs). [[compactFrames]] later purges the tombstoned
    * rows physically and drops the tombstone frame.
    *
    * Idempotent: already-tombstoned and never-indexed ids contribute
    * no deltas and no duplicate tombstone rows — a retried remove
    * cannot double-subtract the counts.
    *
    * Caller contract: a removed id must NOT be re-[[append]]ed before
    * a [[compactFrames]] purge — the tombstone anti-join would
    * suppress the re-added rows (enforced contract-by-documentation,
    * same class as the unique-ids contract).
    *
    * Returns a [[LshSkew.RemovalReport]]: `uncappedBuckets` counts
    * buckets this takedown moved from over-`maxBucketSize` to under
    * it — the cap-regime hazard for LABELING repair
    * ([[DupClusters.removeFromLabeling]] scaladoc): an un-capped
    * bucket starts serving pairs in components the removal did not
    * touch, outside the touched-component repair's view.
    * `report.anyUncapped` ⇒ rebuild the labeling with
    * [[DupClusters.componentsStar]] instead of repairing it. Pass the
    * `maxBucketSize` your pair reads use (index reads are unaffected
    * — the report is advisory for the labeling seam).
    *
    * `ids`: any frame whose FIRST column is the document id.
    */
  def remove(spark: SparkSession, path: String, ids: DataFrame,
             maxBucketSize: Int = LshSkew.DefaultMaxBucketSize)
      : LshSkew.RemovalReport = {
    val meta = readMeta(spark, s"$path/_lsh_meta.json")
    requireReadable(meta, path)
    IndexFiles.withWriterLease(spark, path, "LshIndex.remove") {
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tombPath = new Path(s"$path/$Tombstones")
      // fresh ids only: drop already-tombstoned ids (idempotence) and
      // keep a stable single-column shape. The distinct is cheap —
      // takedown sets are ids only.
      val requested = ids.select(col(ids.columns.head).as("id")).distinct()
      val fresh = (if (fs.exists(tombPath))
          requested.join(spark.read.parquet(tombPath.toString),
            Seq("id"), "left_anti")
        else requested)
        .localCheckpoint(true) // the deltas AND the tombstone write read it
      try {
        // negative deltas from the CURRENT banded rows of the fresh
        // ids — map-side (tombstone side broadcast), O(removed) output
        val deltas = spark.read.parquet(s"$path/banded.parquet")
          .join(broadcast(fresh), Seq("id"), "left_semi")
          .groupBy(col("band_idx"), col("band_hash"))
          .agg((-count(lit(1))).as("bucket_n"))
          .localCheckpoint(true) // the report AND the counts write read it
        try {
          // the un-cap report reads CURRENT totals — before the append
          val uncapped = LshSkew.uncapCensus(
            spark.read.parquet(s"$path/buckets.parquet"), deltas,
            Seq("band_idx", "band_hash"), maxBucketSize, deltas.count())
          fs.delete(new Path(s"$path/_lsh_meta.json"), false)
          fresh.coalesce(1).write.mode(SaveMode.Append)
            .parquet(tombPath.toString)
          deltas.coalesce(1).write.mode(SaveMode.Append)
            .parquet(s"$path/buckets.parquet")
          // version stamps WITH the layout: a pre-tombstone build must
          // refuse this index, not silently serve the removed documents
          writeMeta(spark, s"$path/_lsh_meta.json",
            meta.copy(version = TombstoneVersion))
          LshSkew.RemovalReport(fresh.count(), uncapped)
        } finally deltas.unpersist()
      } finally fresh.unpersist()
    }
  }

  /** The cache-or-build face (same contract as
    * [[IvfIndex.loadOrTrain]]): load the index at `path` if complete
    * AND its meta matches the requested params exactly, otherwise
    * (re)build from `df` and load the fresh copy. A param mismatch is
    * a REBUILD, not an error — banding params are part of the index's
    * identity (pairs from mismatched banding would be silently
    * different), so changing them must invalidate the cache the same
    * way a format bump does. A corrupt/truncated meta is an incomplete
    * index: cache miss, rebuild. The one asymmetry shared with
    * [[IvfIndex.loadOrTrain]]: an index written by a NEWER format
    * version still throws — an old build silently clobbering a newer
    * build's artifact would be data loss, not cache maintenance.
    */
  def loadOrBuild(spark: SparkSession, path: String, df: => DataFrame,
                  textCol: String, idCol: String = "doc_id",
                  shingleWidth: Int = 1, numHashes: Int = 24,
                  numBands: Int = 3,
                  verifyOn: Dedup.VerifyOn = Dedup.VerifyOn.HashSets): Index = {
    val metaPath = new Path(s"$path/_lsh_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val want = Meta(FormatVersion, idCol, shingleWidth, numHashes, numBands,
      Dedup.payloadColumn(verifyOn))
    val found =
      if (!fs.exists(metaPath)) None
      // a TOMBSTONED index with matching params is the same cache
      // entry (removals are state, not identity) — normalize for the
      // comparison; load serves the survivor view
      else parseMeta(readMetaText(spark, metaPath.toString))
        .map(m => if (m.version == TombstoneVersion)
          m.copy(version = FormatVersion) else m)
    found.foreach { m =>
      require(m.version <= FormatVersion,
        s"LshIndex at $path has format version ${m.version}, newer than " +
          s"this build's $FormatVersion — refusing to overwrite a newer " +
          "build's index; delete it explicitly to rebuild")
    }
    if (!found.contains(want))
      build(spark, path, df, textCol, idCol, shingleWidth, numHashes,
        numBands, verifyOn)
    load(spark, path)
  }

  /** True iff a COMPLETE index of THIS format with EXACTLY these
    * params exists at `path` — [[loadOrBuild]]'s cache-hit predicate
    * without the load, for callers (measurement fixtures) that must
    * not pay a load outside their timed region. Says nothing about
    * newer-version indexes (false for them too); the
    * clobber-protection decision belongs to the mutating caller.
    */
  def isCompatible(spark: SparkSession, path: String,
                   idCol: String = "doc_id",
                   shingleWidth: Int = 1, numHashes: Int = 24,
                   numBands: Int = 3,
                   verifyOn: Dedup.VerifyOn = Dedup.VerifyOn.HashSets): Boolean = {
    val metaPath = new Path(s"$path/_lsh_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(metaPath) &&
      parseMeta(readMetaText(spark, metaPath.toString))
        .map(m => if (m.version == TombstoneVersion)
          m.copy(version = FormatVersion) else m)
        .contains(Meta(FormatVersion, idCol, shingleWidth, numHashes,
          numBands, Dedup.payloadColumn(verifyOn)))
  }

  /** Near-dup pairs involving ≥ 1 document of `newDf`, against the
    * loaded index — banding params and verify payload come from the
    * index meta, so a batch can never be shingled differently from the
    * corpus it is compared to. Returns (pairs, census); the pair frame
    * is eagerly materialized (id_a, id_b, jaccard), the census covers
    * the buckets the batch touched. Output equals the full
    * [[Dedup.lshNearDupPairs]] over corpus ∪ batch restricted to pairs
    * with ≥ 1 batch id (same threshold and cap).
    */
  def incrementalPairs(index: Index, newDf: DataFrame, textCol: String,
                       threshold: Double = 0.9,
                       maxBucketSize: Int = LshSkew.DefaultMaxBucketSize)
      : (DataFrame, LshSkew.CapCensus) =
    Dedup.lshNearDupPairsIncrementalFrames(
      index.base, index.banded, index.buckets,
      newDf, textCol, index.idCol,
      index.shingleWidth, index.numHashes, index.numBands,
      threshold, maxBucketSize, index.verifyOn)

  /** Verified near-dup pairs WITHIN a subset of already-indexed ids,
    * served purely from the index frames — no text, no re-shingling
    * (the base payload carries the verify sets). Equals the full
    * [[Dedup.lshNearDupPairs]] over the index's (survivor) corpus
    * restricted to subset×subset pairs, same threshold and cap — on a
    * tombstoned index the subset is implicitly intersected with the
    * survivors ([[load]]'s anti-join) and bucket totals are the
    * delta-corrected post-removal counts.
    *
    * The maintenance primitive behind
    * [[DupClusters.removeFromLabeling]]: after a takedown, the
    * touched components' surviving members are re-paired through this
    * — O(subset) with the corpus frames scanned once map-side
    * ([[LshIncremental.candidatesAmong]]).
    *
    * `ids`: any frame whose FIRST column is the document id.
    */
  def pairsAmong(index: Index, ids: DataFrame,
                 threshold: Double = 0.9,
                 maxBucketSize: Int = LshSkew.DefaultMaxBucketSize)
      : (DataFrame, LshSkew.CapCensus) =
    Dedup.lshNearDupPairsAmongFrames(
      index.base, index.banded, index.buckets,
      ids.select(col(ids.columns.head).as("id")).distinct(),
      threshold, maxBucketSize, index.verifyOn)

  /** Fold a batch into the index: append its base/banded rows and its
    * bucket-count DELTAS, under the same banding params (read from the
    * meta — a mismatched append is structurally impossible). After
    * append, [[load]] + [[incrementalPairs]] behave as if the index had
    * been [[build]]t over corpus ∪ batch (spec-pinned: frame equality
    * for base/banded, per-bucket-total equality for counts).
    *
    * Crash-safety: the meta is deleted before any mutation and
    * rewritten only after all three frames are consistent; every write
    * in between is a pure O(batch) append (format v2 — nothing
    * corpus-sized is read or rewritten). A killed append leaves an
    * index that refuses to load — rebuild it.
    *
    * `batchMarker` (the streaming fold-in's exactly-once handle): the
    * id is recorded in `_appended_through` INSIDE the append
    * transaction — after the frames, before the meta — so there is no
    * window where the append completed but the marker is missing: a
    * crash before the meta write leaves an incomplete index (loud
    * rebuild), never a silently re-appendable one. [[appendedThrough]]
    * reads the marker back. Marker semantics are [[IndexFiles]]'s:
    * monotonic (`max(existing, new)` — out-of-order ids never regress
    * it) and identity-checked (a batch-API marker cannot silently mix
    * with a streaming query's marker — the ids would be unrelated).
    */
  def append(spark: SparkSession, path: String, df: DataFrame,
             textCol: String, batchMarker: Option[Long] = None): Unit = {
    val meta = readMeta(spark, s"$path/_lsh_meta.json")
    requireReadable(meta, path)
    // identity pre-flight BEFORE the transaction: a mismatch must be a
    // clean refusal, not a mid-transaction abort that leaves no meta
    batchMarker.foreach(_ =>
      IndexFiles.requireWriter(spark, path, IndexFiles.ManualWriter))
    val (base, banded) = Dedup.bandedFrame(df, textCol, meta.idCol,
      meta.shingleWidth, meta.numHashes, meta.numBands,
      payloadVerifyOn(meta.payload))
    try IndexFiles.withWriterLease(spark, path, "LshIndex.append") {
      appendFrames(spark, path, base, banded, meta, batchMarker,
        IndexFiles.ManualWriter)
    } finally {
      base.unpersist()
      banded.unpersist()
    }
  }

  /** The append transaction over ALREADY-banded frames — shared by
    * [[append]] and the streaming fold-in (which bands each
    * micro-batch exactly once for BOTH the pair run and this append).
    *
    * O(batch) BY LAYOUT: all three frames append — the counts frame
    * is delta rows (format v2; readers sum per bucket), so folding a
    * batch in never reads or rewrites anything corpus-sized. The
    * pre-v2 layout merged + rewrote the full counts frame here, an
    * O(distinct buckets) read+write per micro-batch that would
    * dominate a stream against a large corpus; [[compactBuckets]] is
    * the explicit maintenance face that bounds delta growth.
    */
  private def appendFrames(spark: SparkSession, path: String,
                           base: DataFrame, banded: DataFrame,
                           meta: Meta, batchMarker: Option[Long],
                           writer: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the caller read `meta` BEFORE acquiring the lease (banding needs
    // the params up front) — re-read it INSIDE the transaction and
    // write the FRESH copy back, because the version can have moved in
    // between: a completed remove() stamped TombstoneVersion, and
    // re-stamping the stale FormatVersion over it would re-enable
    // pre-tombstone builds to read the index and serve removed
    // documents. A params drift (a concurrent REBUILD with different
    // banding) means this batch was banded against a dead index —
    // loud refusal, the frames cannot be folded in.
    val fresh = readMeta(spark, s"$path/_lsh_meta.json")
    require(fresh.copy(version = meta.version) == meta,
      s"LshIndex at $path was rebuilt with different params while this " +
        s"append was banding its batch (banded with $meta, index now " +
        s"$fresh) — re-run the append against the current index")
    // size the writes to the BATCH, not to the session's partition
    // count: un-coalesced, every fold-in writes shuffle.partitions
    // (32) files per frame no matter how small the batch — measured
    // (IndexMaintProbe): the dominant term of the small-file debris
    // compactFrames exists to clean. The count reads the caller's
    // cached frame; a micro-batch lands as ONE file per frame, a
    // genuinely huge manual append still splits
    val parts = math.max(1L,
      (banded.count() + RowsPerAppendFile - 1) / RowsPerAppendFile).toInt
    fs.delete(new Path(s"$path/_lsh_meta.json"), false)
    base.select(col("id"), col(meta.payload)).coalesce(parts)
      .write.mode(SaveMode.Append).parquet(s"$path/base.parquet")
    banded.coalesce(parts)
      .write.mode(SaveMode.Append).parquet(s"$path/banded.parquet")
    banded.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("bucket_n")).coalesce(parts)
      .write.mode(SaveMode.Append).parquet(s"$path/buckets.parquet")
    batchMarker.foreach(id => IndexFiles.writeMarker(spark, path, id, writer))
    writeMeta(spark, s"$path/_lsh_meta.json", fresh)
  }

  /** Append-write sizing: ~4 M banded rows (~100-200 MB parquet) per
    * file — micro-batches fold in as one file per frame, bulk appends
    * still parallelize.
    */
  private val RowsPerAppendFile = 4000000L

  /** Bound the per-append SMALL-FILE growth of all three frames — the
    * physical-maintenance face for long-running streams. Every
    * [[append]]/streaming fold-in writes one new small parquet file
    * set into base/banded/buckets, and [[load]] re-lists all three
    * dirs per micro-batch: after thousands of fold-ins, listing +
    * parquet footer reads dominate the O(batch) incremental win
    * (measured — BASELINE.md §"Index file maintenance": load+pair
    * wall at 8 M docs grows with append count and compaction restores
    * the fresh-build cost). This rewrites each frame to
    * ~`targetFileBytes` files via the [[graft.ops.Compaction]]
    * footer-verified discipline (base/banded: row-parity-checked
    * rewrite; buckets: delta rows aggregated to one per bucket, like
    * [[compactBuckets]], then size-bounded).
    *
    * QUIESCE FIRST (same contract as [[compactBuckets]]): run between
    * streams/batches, not against a live reader — the swap removes
    * the old frame files, so an in-flight plan that listed them can
    * fail mid-job. All heavy work (three rewrites into `.tmp` dirs)
    * runs BEFORE the meta is touched; the refuse-to-load window is
    * only the final delete + three renames + meta rewrite, and a kill
    * inside it leaves an index that refuses to load — rebuild it. The
    * append marker is NOT touched: compaction changes layout, never
    * which batches are folded in.
    */
  def compactFrames(spark: SparkSession, path: String,
                    targetFileBytes: Long = 128L * 1024 * 1024)
      : IndexFiles.FramesReport = {
    val meta = readMeta(spark, s"$path/_lsh_meta.json")
    // same asymmetric version guard as compactBuckets: rewriting a
    // NEWER layout's frames with this build's reader — then re-stamping
    // the newer meta over the result — would be silent corruption
    requireReadable(meta, path)
    IndexFiles.withWriterLease(spark, path, "LshIndex.compactFrames") {
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      Frames.foreach(f => fs.delete(new Path(s"$path/$f.tmp"), true))
      val tombPath = s"$path/$Tombstones"
      val hasTombs = fs.exists(new Path(tombPath))
      // with tombstones, compaction is also the physical PURGE: the
      // rewrite drops the tombstoned rows and the verified parity is
      // "survivors in == rows out" (the Report's rowsBefore carries
      // the SURVIVING pre-rewrite count in that mode); the tombstone
      // frame itself is dropped in the swap window below
      def rewrite(frame: String): graft.ops.Compaction.Report =
        if (!hasTombs)
          graft.ops.Compaction.compactTo(spark, s"$path/$frame",
            s"$path/$frame.tmp", targetFileBytes)
        else IndexFiles.purgeRewrite(spark, s"$path/$frame",
          s"$path/$frame.tmp", tombPath, "id", targetFileBytes)
      val baseR = rewrite("base.parquet")
      val bandedR = rewrite("banded.parquet")
      // the removal deltas fold into the aggregation like any others —
      // bucket totals are already post-removal, the purge changes
      // nothing on the counts side
      val (bFiles, _, bRows, bBytes) =
        graft.ops.Compaction.census(spark, s"$path/buckets.parquet")
      val nOut = math.max(1L,
        (bBytes + targetFileBytes - 1) / targetFileBytes).toInt
      spark.read.parquet(s"$path/buckets.parquet")
        .groupBy(col("band_idx"), col("band_hash"))
        .agg(sum(col("bucket_n")).as("bucket_n"))
        .filter(col("bucket_n") > 0)
        .coalesce(nOut)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/buckets.parquet.tmp")
      val (bFilesAfter, _, bRowsAfter, _) =
        graft.ops.Compaction.census(spark, s"$path/buckets.parquet.tmp")
      fs.delete(new Path(s"$path/_lsh_meta.json"), false)
      Frames.foreach { f =>
        fs.delete(new Path(s"$path/$f"), true)
        require(fs.rename(new Path(s"$path/$f.tmp"), new Path(s"$path/$f")),
          s"LshIndex.compactFrames: rename failed for $f at $path")
      }
      if (hasTombs) fs.delete(new Path(tombPath), true)
      // the purge restores the plain layout — stamp the version back
      writeMeta(spark, s"$path/_lsh_meta.json",
        meta.copy(version = FormatVersion))
      IndexFiles.FramesReport(baseR, bandedR, bFiles, bFilesAfter,
        bRows, bRowsAfter)
    }
  }

  /** Aggregate the counts deltas back to one row per bucket — the
    * explicit maintenance op for long-running streams (each append
    * adds one delta row per batch-touched bucket; reads stay correct
    * regardless, this just keeps the counts frame from growing
    * unboundedly). [[compactFrames]] is the full face (also bounds
    * every frame's FILE count); this one stays for counts-only
    * maintenance, which skips the two corpus-frame rewrites.
    *
    * QUIESCE FIRST: run between streams/batches, not against a live
    * reader — the swap removes the old counts files, so an in-flight
    * plan that listed them can fail mid-job. The aggregation runs
    * BEFORE the meta is touched (old index stays fully readable for
    * the whole Spark job); the refuse-to-load window is only the
    * final delete + swap + meta rewrite, and a kill inside it leaves
    * an index that refuses to load — rebuild it.
    */
  def compactBuckets(spark: SparkSession, path: String): Unit = {
    val meta = readMeta(spark, s"$path/_lsh_meta.json")
    // same asymmetric version guard as append/loadOrBuild: rewriting a
    // NEWER layout's counts with this build's semantics — and then
    // re-stamping the newer meta over it — would be silent corruption
    requireReadable(meta, path)
    IndexFiles.withWriterLease(spark, path, "LshIndex.compactBuckets") {
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = s"$path/buckets.parquet.tmp"
      fs.delete(new Path(tmp), true) // clear a killed compaction's leftover
      spark.read.parquet(s"$path/buckets.parquet")
        .groupBy(col("band_idx"), col("band_hash"))
        .agg(sum(col("bucket_n")).as("bucket_n"))
        .filter(col("bucket_n") > 0)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
      fs.delete(new Path(s"$path/_lsh_meta.json"), false)
      fs.delete(new Path(s"$path/buckets.parquet"), true)
      require(fs.rename(new Path(tmp), new Path(s"$path/buckets.parquet")),
        s"LshIndex.compactBuckets: rename failed at $path")
      writeMeta(spark, s"$path/_lsh_meta.json", meta)
    }
  }

  /** The highest batch id folded in via `append(..., batchMarker)`;
    * −1 if no marked append ever completed. The streaming fold-in's
    * replay check ([[IndexFiles.readMarker]] carries the writer
    * identity the check additionally requires).
    */
  def appendedThrough(spark: SparkSession, path: String): Long =
    IndexFiles.appendedThrough(spark, path)

  /** Streaming corpus-growth dedup: the `foreachBatch` body that runs
    * each arriving micro-batch of documents through
    * [[incrementalPairs]] against the index at `path`, hands the pair
    * frame to `onPairs`, and (when `appendBatches`, the default) folds
    * the batch into the index so LATER micro-batches pair against it —
    * across the whole stream every batch-touching pair is produced
    * EXACTLY ONCE (within-batch pairs by the batch's own incremental
    * run, cross-batch pairs when the later side arrives), which is why
    * the q110 gate can replay the stream against q109's batch oracle.
    *
    * State lives in the INDEX, not the state store: this is the
    * stateless-streaming shape of near-dup dedup — no watermark, no
    * growing dedup state, restart-safe because the index on disk IS
    * the progress. Replay safety: the batch id is recorded inside the
    * append transaction ([[append]]'s `batchMarker`). A replayed
    * micro-batch (id ≤ [[appendedThrough]]) NEVER double-appends, and
    * its pair emission is reproduced EXACTLY: the index already
    * contains the batch, so the pre-append view is reconstructed by
    * subtracting this batch's own rows (exact — the marker guarantees
    * it was folded in exactly once) before re-running the pair plan;
    * without the subtraction the batch would pair against itself
    * through both the index and the batch side, emitting duplicated
    * and cap-distorted rows. Spec-pinned (LshIndexSpec replay test;
    * StreamIncLshRestartSpec drives it cross-session through a real
    * checkpoint). The replay check is IDENTITY-SCOPED: the marker
    * records which streaming query (or batch caller) folded batches
    * in, and a different identity — a fresh/changed checkpoint whose
    * batch ids restart at 0, so comparing against the dead stream's
    * high marker would misclassify every new batch — is a hard error,
    * never a silent misclassification (index and checkpoint are
    * created and deleted together, or the index is rebuilt).
    *
    * Each micro-batch is banded ONCE — the same persisted frames feed
    * the pair run and the fold-in append.
    *
    * `onCensus` (default no-op) receives each batch's
    * [[LshSkew.CapCensus]] — a production stream asserts
    * `!census.anyDropped` (or routes drops) there, the same
    * post-condition the batch API returns directly.
    *
    * Usage:
    * {{{
    *   docsStream.writeStream
    *     .foreachBatch(LshIndex.streamingDedupBatch(spark, path, "text")(
    *       (pairs, batchId) => pairs.write.mode("append").parquet(out)))
    *     .trigger(Trigger.AvailableNow()).start()
    * }}}
    */
  def streamingDedupBatch(spark: SparkSession, path: String, textCol: String,
                          threshold: Double = 0.9,
                          maxBucketSize: Int = LshSkew.DefaultMaxBucketSize,
                          appendBatches: Boolean = true,
                          onCensus: (LshSkew.CapCensus, Long) => Unit =
                            (_, _) => ())(
      onPairs: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      // re-load per batch: append adds files, and a cached listing
      // would pair this batch against a stale corpus
      val index = load(spark, path)
      val meta = readMeta(spark, s"$path/_lsh_meta.json")
      // identity + replay resolution and the replay subtraction view
      // are the SHARED definitions (IndexFiles.resolveReplay /
      // LshIncremental.subtractBatch — see their scaladoc for the
      // misclassification and exactly-once arguments)
      val (writerId, alreadyFolded) =
        IndexFiles.resolveReplay(spark, path, "LshIndex", batchId)
      val (bBase, bBanded) = Dedup.bandedFrame(batch, textCol, index.idCol,
        index.shingleWidth, index.numHashes, index.numBands, index.verifyOn)
      try {
        val corpusView =
          if (!alreadyFolded) index
          else {
            val (b, bd, bk) = LshIncremental.subtractBatch(
              index.base, index.banded, index.buckets, bBase,
              Seq("band_idx", "band_hash"))
            index.copy(base = b, banded = bd, buckets = bk)
          }
        val (pairsLazy, caches, census) =
          Dedup.lshNearDupPairsIncrementalFromFrames(
            corpusView.base, corpusView.banded, corpusView.buckets,
            bBase, bBanded, threshold, maxBucketSize, index.verifyOn)
        val pairs =
          try pairsLazy.localCheckpoint(true)
          finally caches.foreach(_.unpersist())
        onCensus(census, batchId)
        onPairs(pairs, batchId)
        if (appendBatches && !alreadyFolded)
          IndexFiles.withWriterLease(spark, path, "LshIndex streaming fold-in") {
            appendFrames(spark, path, bBase, bBanded, meta, Some(batchId),
              writerId)
          }
      } finally {
        bBase.unpersist()
        bBanded.unpersist()
      }
    }

  // hand-rolled flat JSON, same shape/discipline as IvfIndex's meta:
  // fixed fields, no nesting; parse failure = incomplete index
  // atomic write-to-temp + rename — IndexFiles.publishMetaFile
  private def writeMeta(spark: SparkSession, path: String, m: Meta): Unit =
    IndexFiles.publishMetaFile(spark, path,
      s"""{"version":${m.version},"idCol":"${m.idCol}",""" +
        s""""shingleWidth":${m.shingleWidth},"numHashes":${m.numHashes},""" +
        s""""numBands":${m.numBands},"payload":"${m.payload}"}""")

  private def readMeta(spark: SparkSession, path: String): Meta =
    parseMeta(readMetaText(spark, path)).getOrElse(sys.error(
      s"LshIndex meta at $path exists but is truncated/corrupt (killed " +
        "writer?) — the index is incomplete; rebuild it"))

  // missing-vs-mid-transaction diagnosis shared with the other
  // indexes — see IndexFiles.readMetaFile
  private def readMetaText(spark: SparkSession, path: String): String = {
    val dir = new Path(path).getParent
    IndexFiles.readMetaFile(spark, dir.toString, "_lsh_meta.json",
      s"no LSH index at $dir: missing/incomplete (no _lsh_meta.json)")
  }

  private def parseMeta(text: String): Option[Meta] = {
    def str(k: String): Option[String] =
      s""""$k":"([^"]*)"""".r.findFirstMatchIn(text).map(_.group(1))
    def num(k: String): Option[Int] =
      s""""$k":([^,}]*)""".r.findFirstMatchIn(text)
        .flatMap(_.group(1).toIntOption)
    for {
      version <- num("version")
      idCol <- str("idCol")
      shingleWidth <- num("shingleWidth")
      numHashes <- num("numHashes")
      numBands <- num("numBands")
      payload <- str("payload")
    } yield Meta(version, idCol, shingleWidth, numHashes, numBands, payload)
  }
}
