package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted SRP-LSH embedding index — [[LshIndex]]'s twin for the
  * EMBEDDING near-dup path ([[Similarity.srpNearDupPairs]]): at corpus
  * scale the expensive passes are the numBands×planesPerBand
  * dot-product battery and the sign-bucket self-join, so the
  * bucket-derived frames are built ONCE, persisted to parquet, and
  * every arriving vector batch runs [[incrementalPairs]] against them
  * — O(batch) work plus map-side corpus-frame scans, no corpus
  * re-projection, no corpus×corpus pair regeneration. [[append]] folds
  * the batch in so the next batch sees it as corpus. Same
  * compute-once-reload contract as the S8 parquet cache
  * (`processors/_impl/plotting_impl.py:126-147`,
  * [[graft.sinks.Exporters.cached]]), same three-frame artifact and
  * crash-safety protocol as [[LshIndex]] (meta written LAST, deleted
  * FIRST on any mutation), same marker/lease discipline
  * ([[IndexFiles]]):
  *
  * {{{
  *   <path>/_srp_meta.json     format version + banding params
  *   <path>/base.parquet       (id, v array<double>)  — verify payload
  *   <path>/banded.parquet     (id, band_idx, bucket)
  *   <path>/buckets.parquet    (band_idx, bucket, bucket_n) — DELTA rows
  * }}}
  *
  * The hyperplanes are NOT persisted: [[Similarity.srpPlanes]] derives
  * them deterministically from (numBands, planesPerBand, dims) via
  * md5, so the meta's params fully determine the projection — a batch
  * can never be bucketed with different planes than the corpus it is
  * compared to (the same enforced-from-meta contract as LshIndex's
  * banding params).
  *
  * Caller contract: vector ids unique across the corpus and every
  * batch (the index never re-checks); `buckets.parquet` is append-only
  * delta rows summed by readers, so [[append]] is O(batch) — bound the
  * per-append small-file growth with [[compactFrames]].
  */
object SrpIndex {

  /** Bumped on layout changes; [[load]] rejects indexes written by a
    * different layout rather than misreading them. v1 is the
    * delta-counts layout from the start (LshIndex's v2 lesson baked
    * in: a per-append counts rewrite is O(corpus) per fold-in).
    */
  val FormatVersion = 1

  /** Stamped by [[remove]], stamped back by [[compactFrames]]' purge —
    * [[LshIndex.TombstoneVersion]]'s exact contract: the tombstone
    * layout changes read semantics, so a pre-tombstone build must
    * refuse the index loudly, not serve removed vectors.
    */
  val TombstoneVersion = FormatVersion + 1

  private def requireReadable(meta: Meta, path: String): Unit =
    require(meta.version == FormatVersion || meta.version == TombstoneVersion,
      s"SrpIndex at $path has format version ${meta.version}; this build " +
        s"reads $FormatVersion (and $TombstoneVersion = tombstoned)")

  final case class Index(base: DataFrame, banded: DataFrame,
                         buckets: DataFrame,
                         idCol: String, numBands: Int, planesPerBand: Int,
                         dims: Int)

  private final case class Meta(version: Int, idCol: String,
                                numBands: Int, planesPerBand: Int, dims: Int)

  private val Frames = Seq("base.parquet", "banded.parquet", "buckets.parquet")

  /** Build (or overwrite) the index at `path` from `df`'s `vecCol`.
    * One corpus pass: project → sign buckets → band explode, then the
    * three frames written; the self-join is NOT run — corpus-internal
    * pairs are the build-time caller's business
    * ([[Similarity.srpNearDupPairs]] over the same frame).
    */
  def build(spark: SparkSession, path: String, df: DataFrame,
            idCol: String = "vec_id", vecCol: String = "embedding",
            numBands: Int = 4, planesPerBand: Int = 8, dims: Int = 64): Unit = {
    require(!idCol.exists(c => c == '"' || c == '\\'),
      s"SrpIndex.build: idCol '$idCol' contains a quote/backslash — not " +
        "representable in the index meta; rename the column before building")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (base, banded) = Similarity.srpFrames(df, idCol, vecCol,
      numBands, planesPerBand, dims)
    try IndexFiles.withWriterLease(spark, path, "SrpIndex.build") {
      // meta deleted first; leftover tmp dirs and the replay marker
      // cleared — same rebuild-owns-recovery contract as LshIndex.build
      fs.delete(new Path(s"$path/_srp_meta.json"), false)
      Frames.foreach(f => fs.delete(new Path(s"$path/$f.tmp"), true))
      IndexFiles.deleteMarker(spark, path)
      fs.delete(new Path(s"$path/$Tombstones"), true)
      base.write.mode(SaveMode.Overwrite).parquet(s"$path/base.parquet")
      banded.write.mode(SaveMode.Overwrite).parquet(s"$path/banded.parquet")
      banded.groupBy(col("band_idx"), col("bucket"))
        .agg(count(lit(1)).as("bucket_n"))
        .write.mode(SaveMode.Overwrite).parquet(s"$path/buckets.parquet")
      writeMeta(spark, path,
        Meta(FormatVersion, idCol, numBands, planesPerBand, dims))
    } finally {
      base.unpersist()
      banded.unpersist()
    }
  }

  /** Load a built index. Fails with an explicit message on a missing /
    * incomplete index or a format-version mismatch.
    */
  def load(spark: SparkSession, path: String): Index = {
    val meta = readMeta(spark, path)
    requireReadable(meta, path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (base, banded) = {
      val b = spark.read.parquet(s"$path/base.parquet")
      val bd = spark.read.parquet(s"$path/banded.parquet")
      if (!fs.exists(new Path(s"$path/$Tombstones"))) (b, bd)
      else {
        // removed vectors invisible map-side — LshIndex.load's exact
        // tombstone semantics (see its scaladoc)
        val tomb = broadcast(spark.read.parquet(s"$path/$Tombstones"))
        (b.join(tomb, Seq("id"), "left_anti"),
          bd.join(tomb, Seq("id"), "left_anti"))
      }
    }
    Index(base, banded,
      spark.read.parquet(s"$path/buckets.parquet"),
      meta.idCol, meta.numBands, meta.planesPerBand, meta.dims)
  }

  private val Tombstones = "tombstones.parquet"

  /** Take vectors DOWN — [[LshIndex.remove]]'s exact contract for the
    * embedding index: tombstone append + negative count deltas, both
    * O(removed); idempotent; purged physically by [[compactFrames]];
    * a removed id must not be re-appended before a purge. Returns the
    * same [[LshSkew.RemovalReport]] (un-capped buckets ⇒ labeling
    * repair incomplete — see LshIndex.remove's scaladoc).
    */
  def remove(spark: SparkSession, path: String, ids: DataFrame,
             maxBucketSize: Int = LshSkew.DefaultMaxBucketSize)
      : LshSkew.RemovalReport = {
    val meta = readMeta(spark, path)
    requireReadable(meta, path)
    IndexFiles.withWriterLease(spark, path, "SrpIndex.remove") {
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tombPath = new Path(s"$path/$Tombstones")
      val requested = ids.select(col(ids.columns.head).as("id")).distinct()
      val fresh = (if (fs.exists(tombPath))
          requested.join(spark.read.parquet(tombPath.toString),
            Seq("id"), "left_anti")
        else requested)
        .localCheckpoint(true)
      try {
        val deltas = spark.read.parquet(s"$path/banded.parquet")
          .join(broadcast(fresh), Seq("id"), "left_semi")
          .groupBy(col("band_idx"), col("bucket"))
          .agg((-count(lit(1))).as("bucket_n"))
          .localCheckpoint(true)
        try {
          val uncapped = LshSkew.uncapCensus(
            spark.read.parquet(s"$path/buckets.parquet"), deltas,
            Seq("band_idx", "bucket"), maxBucketSize, deltas.count())
          fs.delete(new Path(s"$path/_srp_meta.json"), false)
          fresh.coalesce(1).write.mode(SaveMode.Append)
            .parquet(tombPath.toString)
          deltas.coalesce(1).write.mode(SaveMode.Append)
            .parquet(s"$path/buckets.parquet")
          writeMeta(spark, path, meta.copy(version = TombstoneVersion))
          LshSkew.RemovalReport(fresh.count(), uncapped)
        } finally deltas.unpersist()
      } finally fresh.unpersist()
    }
  }

  /** The cache-or-build face — [[LshIndex.loadOrBuild]]'s contract
    * verbatim: load the index at `path` if complete AND its meta
    * matches the requested params exactly, otherwise (re)build from
    * `df` and load the fresh copy. A param mismatch is a REBUILD
    * (banding params are the index's identity), a corrupt/truncated
    * meta is a cache miss, an index written by a NEWER format version
    * still throws (clobbering a newer build's artifact would be data
    * loss, not cache maintenance).
    */
  def loadOrBuild(spark: SparkSession, path: String, df: => DataFrame,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  numBands: Int = 4, planesPerBand: Int = 8,
                  dims: Int = 64): Index = {
    val metaPath = new Path(s"$path/_srp_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val want = Meta(FormatVersion, idCol, numBands, planesPerBand, dims)
    val found =
      if (!fs.exists(metaPath)) None
      // a tombstoned index with matching params is the same cache
      // entry (removals are state, not identity)
      else parseMeta(IndexFiles.readTextFile(spark, metaPath.toString,
        "unreachable: existence checked"))
        .map(m => if (m.version == TombstoneVersion)
          m.copy(version = FormatVersion) else m)
    found.foreach { m =>
      require(m.version <= FormatVersion,
        s"SrpIndex at $path has format version ${m.version}, newer than " +
          s"this build's $FormatVersion — refusing to overwrite a newer " +
          "build's index; delete it explicitly to rebuild")
    }
    if (!found.contains(want))
      build(spark, path, df, idCol, vecCol, numBands, planesPerBand, dims)
    load(spark, path)
  }

  /** True iff a COMPLETE index of THIS format with EXACTLY these
    * params exists at `path` — the cache-hit predicate without the
    * load (measurement fixtures must not pay a load outside their
    * timed region; same contract as [[LshIndex.isCompatible]]).
    */
  def isCompatible(spark: SparkSession, path: String,
                   idCol: String = "vec_id",
                   numBands: Int = 4, planesPerBand: Int = 8,
                   dims: Int = 64): Boolean = {
    val metaPath = new Path(s"$path/_srp_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(metaPath) && parseMeta(IndexFiles.readTextFile(spark,
        metaPath.toString, "unreachable: existence checked"))
      .map(m => if (m.version == TombstoneVersion)
        m.copy(version = FormatVersion) else m)
      .contains(Meta(FormatVersion, idCol, numBands, planesPerBand, dims))
  }

  /** Near-dup pairs involving ≥ 1 vector of `newDf`, against the
    * loaded index — banding params come from the index meta, so a
    * batch can never be projected differently from the corpus it is
    * compared to. Returns (pairs, census); output equals the full
    * [[Similarity.srpNearDupPairs]] over corpus ∪ batch restricted to
    * pairs with ≥ 1 batch id (same threshold and cap) — the q111 gate
    * proves the equality against the full-recompute oracle.
    */
  def incrementalPairs(index: Index, newDf: DataFrame,
                       vecCol: String = "embedding",
                       threshold: Double = 0.9,
                       maxBucketSize: Int = LshSkew.DefaultMaxBucketSize)
      : (DataFrame, LshSkew.CapCensus) = {
    val (newBase, newBanded) = Similarity.srpFrames(newDf, index.idCol,
      vecCol, index.numBands, index.planesPerBand, index.dims)
    try {
      val (pairsLazy, caches, census) =
        Similarity.srpNearDupPairsIncrementalFromFrames(
          index.base, index.banded, index.buckets, newBase, newBanded,
          threshold, maxBucketSize)
      val pairs =
        try pairsLazy.localCheckpoint(true)
        finally caches.foreach(_.unpersist())
      (pairs, census)
    } finally {
      newBase.unpersist()
      newBanded.unpersist()
    }
  }

  /** Verified near-dup pairs WITHIN a subset of already-indexed ids,
    * served purely from the index frames — [[LshIndex.pairsAmong]]'s
    * exact contract for the embedding index (no vectors re-projected:
    * the base payload carries them; same shared
    * [[LshIncremental.candidatesAmong]] machinery, cosine verify).
    * Equals the full [[Similarity.srpNearDupPairs]] over the index's
    * (survivor) corpus restricted to subset×subset, same threshold
    * and cap. The maintenance primitive behind
    * [[DupClusters.removeFromLabeling]] / [[LabelStore.remove]] on
    * the embedding side — after a takedown, touched components'
    * surviving members re-pair through this, O(subset).
    *
    * `ids`: any frame whose FIRST column is the vector id.
    */
  def pairsAmong(index: Index, ids: DataFrame,
                 threshold: Double = 0.9,
                 maxBucketSize: Int = LshSkew.DefaultMaxBucketSize)
      : (DataFrame, LshSkew.CapCensus) = {
    val idsN = ids.select(col(ids.columns.head).as("id")).distinct()
    val (candidates, caches, census) = LshIncremental.candidatesAmong(
      index.banded, index.buckets, idsN, Seq("band_idx", "bucket"),
      maxBucketSize)
    val pairs =
      try candidates
        .join(index.base.select(col("id").as("id_a"), col("v").as("v_a")),
          "id_a")
        .join(index.base.select(col("id").as("id_b"), col("v").as("v_b")),
          "id_b")
        .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
        .filter(col("cosine") >= threshold)
        .select(col("id_a"), col("id_b"), col("cosine"))
        .localCheckpoint(true)
      finally caches.foreach(_.unpersist())
    (pairs, census)
  }

  /** Fold a batch into the index: append its base/banded rows and its
    * bucket-count DELTAS under the meta's params. After append,
    * [[load]] + [[incrementalPairs]] behave as if the index had been
    * [[build]]t over corpus ∪ batch (spec-pinned, the LshIndex
    * contract). Marker semantics are [[IndexFiles]]'s: monotonic,
    * identity-checked, recorded inside the transaction.
    */
  def append(spark: SparkSession, path: String, df: DataFrame,
             vecCol: String = "embedding",
             batchMarker: Option[Long] = None): Unit = {
    val meta = readMeta(spark, path)
    requireReadable(meta, path)
    batchMarker.foreach(_ =>
      IndexFiles.requireWriter(spark, path, IndexFiles.ManualWriter))
    val (base, banded) = Similarity.srpFrames(df, meta.idCol, vecCol,
      meta.numBands, meta.planesPerBand, meta.dims)
    try IndexFiles.withWriterLease(spark, path, "SrpIndex.append") {
      appendFrames(spark, path, base, banded, meta, batchMarker,
        IndexFiles.ManualWriter)
    } finally {
      base.unpersist()
      banded.unpersist()
    }
  }

  /** The append transaction over ALREADY-banded frames — O(batch) BY
    * LAYOUT (all three frames append; counts are delta rows), shared
    * by [[append]] and the streaming fold-in.
    */
  private def appendFrames(spark: SparkSession, path: String,
                           base: DataFrame, banded: DataFrame,
                           meta: Meta, batchMarker: Option[Long],
                           writer: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // re-read the meta INSIDE the transaction and write the fresh copy
    // back — the LshIndex.appendFrames discipline (see its comment): a
    // remove() completing between the caller's pre-lease read and this
    // lease must not have its TombstoneVersion stamp overwritten, and
    // a concurrent rebuild with different params is a loud refusal
    val fresh = readMeta(spark, path)
    require(fresh.copy(version = meta.version) == meta,
      s"SrpIndex at $path was rebuilt with different params while this " +
        s"append was projecting its batch (projected with $meta, index " +
        s"now $fresh) — re-run the append against the current index")
    // batch-sized writes, not partition-count-sized — the LshIndex
    // appendFrames discipline (see its comment; measured there)
    val parts = math.max(1L,
      (banded.count() + RowsPerAppendFile - 1) / RowsPerAppendFile).toInt
    fs.delete(new Path(s"$path/_srp_meta.json"), false)
    base.coalesce(parts)
      .write.mode(SaveMode.Append).parquet(s"$path/base.parquet")
    banded.coalesce(parts)
      .write.mode(SaveMode.Append).parquet(s"$path/banded.parquet")
    banded.groupBy(col("band_idx"), col("bucket"))
      .agg(count(lit(1)).as("bucket_n")).coalesce(parts)
      .write.mode(SaveMode.Append).parquet(s"$path/buckets.parquet")
    batchMarker.foreach(id => IndexFiles.writeMarker(spark, path, id, writer))
    writeMeta(spark, path, fresh)
  }

  /** Append-write sizing — the [[LshIndex]] constant's twin: SRP
    * banded rows are (long, int, long), so ~4 M rows per file keeps
    * the same ~100 MB-file shape.
    */
  private val RowsPerAppendFile = 4000000L

  /** The highest batch id folded in via `append(..., batchMarker)`;
    * −1 if no marked append ever completed.
    */
  def appendedThrough(spark: SparkSession, path: String): Long =
    IndexFiles.appendedThrough(spark, path)

  /** Bound the per-append small-file growth of all three frames —
    * same maintenance op, swap protocol, and quiesce-first contract
    * as [[LshIndex.compactFrames]] (base/banded: footer-verified
    * row-parity rewrite; counts: deltas aggregated to one row per
    * bucket, then size-bounded). Marker untouched.
    */
  def compactFrames(spark: SparkSession, path: String,
                    targetFileBytes: Long = 128L * 1024 * 1024)
      : IndexFiles.FramesReport = {
    val meta = readMeta(spark, path)
    requireReadable(meta, path)
    IndexFiles.withWriterLease(spark, path, "SrpIndex.compactFrames") {
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      Frames.foreach(f => fs.delete(new Path(s"$path/$f.tmp"), true))
      val tombPath = s"$path/$Tombstones"
      val hasTombs = fs.exists(new Path(tombPath))
      // tombstone purge semantics = LshIndex.compactFrames' (rowsBefore
      // carries the SURVIVING count in purge mode)
      def rewrite(frame: String): graft.ops.Compaction.Report =
        if (!hasTombs)
          graft.ops.Compaction.compactTo(spark, s"$path/$frame",
            s"$path/$frame.tmp", targetFileBytes)
        else IndexFiles.purgeRewrite(spark, s"$path/$frame",
          s"$path/$frame.tmp", tombPath, "id", targetFileBytes)
      val baseR = rewrite("base.parquet")
      val bandedR = rewrite("banded.parquet")
      val (bFiles, _, bRows, bBytes) =
        graft.ops.Compaction.census(spark, s"$path/buckets.parquet")
      val nOut = math.max(1L,
        (bBytes + targetFileBytes - 1) / targetFileBytes).toInt
      spark.read.parquet(s"$path/buckets.parquet")
        .groupBy(col("band_idx"), col("bucket"))
        .agg(sum(col("bucket_n")).as("bucket_n"))
        .filter(col("bucket_n") > 0)
        .coalesce(nOut)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/buckets.parquet.tmp")
      val (bFilesAfter, _, bRowsAfter, _) =
        graft.ops.Compaction.census(spark, s"$path/buckets.parquet.tmp")
      fs.delete(new Path(s"$path/_srp_meta.json"), false)
      Frames.foreach { f =>
        fs.delete(new Path(s"$path/$f"), true)
        require(fs.rename(new Path(s"$path/$f.tmp"), new Path(s"$path/$f")),
          s"SrpIndex.compactFrames: rename failed for $f at $path")
      }
      if (hasTombs) fs.delete(new Path(tombPath), true)
      writeMeta(spark, path, meta.copy(version = FormatVersion))
      IndexFiles.FramesReport(baseR, bandedR, bFiles, bFilesAfter,
        bRows, bRowsAfter)
    }
  }

  /** Streaming corpus-growth embedding dedup — the `foreachBatch` body
    * mirroring [[LshIndex.streamingDedupBatch]] exactly: each
    * micro-batch of vectors runs [[incrementalPairs]] against the
    * index, hands the pairs to `onPairs`, and folds the batch in so
    * later micro-batches pair against it. State lives in the INDEX,
    * not the state store; replay safety is the identity-scoped marker
    * ([[IndexFiles]]): a replayed micro-batch reconstructs the
    * pre-append view by subtracting its own rows (negative count
    * deltas — exact by the folded-exactly-once guarantee) and NEVER
    * double-appends; a different stream identity (fresh/changed
    * checkpoint) is a hard error.
    */
  def streamingDedupBatch(spark: SparkSession, path: String,
                          vecCol: String = "embedding",
                          threshold: Double = 0.9,
                          maxBucketSize: Int = LshSkew.DefaultMaxBucketSize,
                          appendBatches: Boolean = true,
                          onCensus: (LshSkew.CapCensus, Long) => Unit =
                            (_, _) => ())(
      onPairs: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val index = load(spark, path)
      val meta = readMeta(spark, path)
      // shared identity/replay + subtraction definitions — see
      // IndexFiles.resolveReplay / LshIncremental.subtractBatch
      val (writerId, alreadyFolded) =
        IndexFiles.resolveReplay(spark, path, "SrpIndex", batchId)
      val (bBase, bBanded) = Similarity.srpFrames(batch, index.idCol, vecCol,
        index.numBands, index.planesPerBand, index.dims)
      try {
        val corpusView =
          if (!alreadyFolded) index
          else {
            val (b, bd, bk) = LshIncremental.subtractBatch(
              index.base, index.banded, index.buckets, bBase,
              Seq("band_idx", "bucket"))
            index.copy(base = b, banded = bd, buckets = bk)
          }
        val (pairsLazy, caches, census) =
          Similarity.srpNearDupPairsIncrementalFromFrames(
            corpusView.base, corpusView.banded, corpusView.buckets,
            bBase, bBanded, threshold, maxBucketSize)
        val pairs =
          try pairsLazy.localCheckpoint(true)
          finally caches.foreach(_.unpersist())
        onCensus(census, batchId)
        onPairs(pairs, batchId)
        if (appendBatches && !alreadyFolded)
          IndexFiles.withWriterLease(spark, path, "SrpIndex streaming fold-in") {
            appendFrames(spark, path, bBase, bBanded, meta, Some(batchId),
              writerId)
          }
      } finally {
        bBase.unpersist()
        bBanded.unpersist()
      }
    }

  // atomic write-to-temp + rename — IndexFiles.publishMetaFile
  private def writeMeta(spark: SparkSession, path: String, m: Meta): Unit =
    IndexFiles.publishMetaFile(spark, s"$path/_srp_meta.json",
      s"""{"version":${m.version},"idCol":"${m.idCol}",""" +
        s""""numBands":${m.numBands},"planesPerBand":${m.planesPerBand},""" +
        s""""dims":${m.dims}}""")

  // missing-vs-mid-transaction diagnosis shared with the other
  // indexes — see IndexFiles.readMetaFile
  private def readMeta(spark: SparkSession, path: String): Meta =
    parseMeta(IndexFiles.readMetaFile(spark, path, "_srp_meta.json",
      s"no SRP index at $path: missing/incomplete (no _srp_meta.json)"))
      .getOrElse(sys.error(
        s"SrpIndex meta at $path exists but is truncated/corrupt (killed " +
          "writer?) — the index is incomplete; rebuild it"))

  private def parseMeta(text: String): Option[Meta] = {
    def str(k: String): Option[String] =
      s""""$k":"([^"]*)"""".r.findFirstMatchIn(text).map(_.group(1))
    def num(k: String): Option[Int] =
      s""""$k":([^,}]*)""".r.findFirstMatchIn(text)
        .flatMap(_.group(1).toIntOption)
    for {
      version <- num("version")
      idCol <- str("idCol")
      numBands <- num("numBands")
      planesPerBand <- num("planesPerBand")
      dims <- num("dims")
    } yield Meta(version, idCol, numBands, planesPerBand, dims)
  }
}
