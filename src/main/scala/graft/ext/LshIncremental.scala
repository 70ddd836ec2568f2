package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE incremental-LSH candidate plan, generic over the bucket
  * key columns — the MinHash text path ([[Dedup]], keys
  * `(band_idx, band_hash)`) and the SRP embedding path
  * ([[Similarity]], keys `(band_idx, bucket)`) produce their
  * batch-vs-corpus candidates through this single definition, so the
  * two paths' identical-output-and-plan-shape contracts (the
  * [[LshIndex]]/[[SrpIndex]] scale arguments) are structural rather
  * than copy-kept — the same sharing discipline as
  * [[Dedup.lshNearDupPairsStagedWithStats]]'s verify stage.
  *
  * Semantics: candidate id pairs involving ≥ 1 member of the batch,
  * under union-bucket capping computed from the STORED per-bucket
  * counts + the batch's own counts (never from re-counting corpus
  * rows). Equals the full self-join over corpus ∪ batch (same cap)
  * restricted to pairs with ≥ 1 batch id — a full-run pair (x, y)
  * survives iff x, y share a capped bucket of the union, and every
  * union bucket containing a batch row is reproduced here.
  *
  * The 100 TB shape (per stage):
  *  - capping touches counts only for buckets the batch touches (a
  *    bucket with no batch row cannot produce a batch pair, dropped
  *    or not) — one map-side semi-filtered scan of the counts frame,
  *    no corpus-side shuffle; the stored frame is DELTA rows
  *    (append-only, negative rows allowed — the streaming replay view
  *    uses them), summed per key after the semi-filter;
  *  - the candidate join streams the corpus banded frame once against
  *    the batch side (EXPLICIT size-guarded broadcast hint —
  *    plan-pinned in LshIndexSpec). Hinting beats trusting the
  *    adaptive threshold: at production scale the batch banded frame
  *    can sit just past the AQE auto-broadcast cutoff, and a silent
  *    fallback to a sort-merge join would shuffle the CORPUS banded
  *    frame, the exact cost the incremental path exists to avoid.
  *    Past [[LshSkew.MaxBroadcastKeys]] banded rows the hint is
  *    omitted (a genuinely huge batch cannot broadcast; Spark then
  *    picks the shuffle plan, and the right call is a rebuild).
  *
  * Returned census covers the buckets the BATCH touches (the only
  * ones that can affect this batch's pairs); the caches are this
  * plan's internal intermediates, owned by the caller.
  */
private[graft] object LshIncremental {

  /** Pre-append corpus view for a REPLAYED micro-batch — the other
    * half of the streaming fold-ins' exactly-once contract (one
    * definition with [[IndexFiles.resolveReplay]]): the index already
    * contains the batch (the marker guarantees it was folded exactly
    * once), so the pre-fold view is reconstructed by anti-joining the
    * batch's ids out of base/banded and appending the batch's
    * CURRENTLY-VISIBLE counts as NEGATIVE delta rows (the counts
    * frame is append-only deltas summed by readers — no rewrite,
    * exact). Without the subtraction the batch would pair against
    * itself through both the index and the batch side, emitting
    * duplicated and cap-distorted rows.
    *
    * The subtracted counts are computed from the INDEX's view of the
    * batch ids (`banded` semi-joined with them), NOT from the batch's
    * own re-banded rows — the two differ exactly when documents were
    * REMOVED between the fold-in and the replay: the tombstone-
    * filtered `banded` no longer carries them, so subtracting their
    * raw counts would double-count the removal's negative deltas and
    * distort every cap decision. With the visible-view subtraction,
    * a replay after an intervening remove reproduces the batch's
    * pairs under the CURRENT corpus (removed documents excluded —
    * the compliance-correct output, since a takedown must scrub
    * replayed emissions too), and exactly the original emission when
    * nothing was removed. Spec-pinned (LshIndexSpec
    * replay-after-remove test).
    */
  def subtractBatch(base: DataFrame, banded: DataFrame, buckets: DataFrame,
                    bBase: DataFrame, keys: Seq[String])
      : (DataFrame, DataFrame, DataFrame) = {
    // same size-guarded hint as candidates(): a replayed manual/micro
    // batch is normally tiny, but a genuinely huge one must not be
    // forced through the driver (bBase is caller-cached, so the
    // sizing count is cheap)
    val idsRaw = bBase.select(col("id"))
    val ids =
      if (bBase.count() <= LshSkew.MaxBroadcastKeys) broadcast(idsRaw)
      else idsRaw
    (base.join(ids, Seq("id"), "left_anti"),
      banded.join(ids, Seq("id"), "left_anti"),
      buckets.unionByName(
        banded.join(ids, Seq("id"), "left_semi")
          .groupBy(keys.map(col): _*)
          .agg((-count(lit(1))).as("bucket_n"))))
  }

  /** Candidate id pairs WITHIN a subset of already-indexed ids —
    * the takedown-maintenance twin of [[candidates]] (which pairs a
    * NEW batch against the corpus; this re-pairs ids the corpus
    * already contains, for [[DupClusters.removeFromLabeling]]'s
    * touched-component re-election). Returns exactly the full
    * self-join run's candidates restricted to subset×subset pairs:
    * a full-run pair (x, y) with x, y ∈ subset survives iff they
    * share a bucket whose CORPUS total is under the cap, and both
    * bucket membership (banded, semi-filtered) and totals (stored
    * counts, delta rows summed — the subset's own rows are already
    * inside them) come straight from the index frames. No text, no
    * re-shingling, no corpus-side shuffle: the subset id set and the
    * touched bucket keys ride size-guarded broadcast hints, so the
    * corpus banded and counts frames are each scanned once map-side;
    * everything after is subset-sized.
    */
  def candidatesAmong(corpusBanded: DataFrame, corpusBuckets: DataFrame,
                      ids: DataFrame, keys: Seq[String],
                      maxBucketSize: Int)
      : (DataFrame, Seq[DataFrame], LshSkew.CapCensus) = {
    val keyCols = keys.map(col)
    val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val nIds = ids.count()
    def hinted(df: DataFrame): DataFrame =
      if (nIds <= LshSkew.MaxBroadcastKeys) broadcast(df) else df
    val subBanded = corpusBanded.join(hinted(ids), Seq("id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    caches += subBanded
    val (census, capped) =
      if (maxBucketSize == Int.MaxValue)
        (LshSkew.CapCensus.none(maxBucketSize), subBanded)
      else {
        // totals only for buckets the subset touches (a bucket with no
        // subset row cannot produce a subset pair, dropped or not) —
        // the stored counts already include the subset's own rows
        val touchedKeys = subBanded.select(keyCols: _*).distinct()
        val totals = corpusBuckets
          .join(hinted(touchedKeys), keys, "left_semi")
          .groupBy(keyCols: _*)
          .agg(sum(col("bucket_n")).as("total"))
        val dropped = totals.filter(col("total") > maxBucketSize)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val censusRow = dropped
          .agg(count(lit(1)), coalesce(sum(col("total")), lit(0L))).head()
        val census = LshSkew.CapCensus(
          censusRow.getLong(0), censusRow.getLong(1), maxBucketSize)
        if (!census.anyDropped) {
          dropped.unpersist()
          (census, subBanded)
        } else {
          caches += dropped
          val guardKeys = dropped.select(keyCols: _*)
          val guard =
            if (census.droppedBuckets <= LshSkew.MaxBroadcastKeys)
              broadcast(guardKeys)
            else guardKeys
          (census, subBanded.join(guard, keys, "left_anti"))
        }
      }
    val a = capped.select(keyCols :+ col("id").as("id_a"): _*)
    val b = capped.select(keyCols :+ col("id").as("id_b"): _*)
    val candidates = a.join(b, keys)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    (candidates, caches.toSeq, census)
  }

  def candidates(corpusBanded: DataFrame, corpusBuckets: DataFrame,
                 newBanded: DataFrame, keys: Seq[String],
                 maxBucketSize: Int)
      : (DataFrame, Seq[DataFrame], LshSkew.CapCensus) = {
    val keyCols = keys.map(col)
    val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // one batch-side action up front: materializes the banded cache
    // (both the counts and the candidate join re-read it) and sizes
    // the explicit broadcast hints below
    val batchBandedRows = newBanded.count()
    def hinted(df: DataFrame): DataFrame =
      if (batchBandedRows <= LshSkew.MaxBroadcastKeys) broadcast(df) else df
    val (census, cappedNew, cappedCorpus) =
      if (maxBucketSize == Int.MaxValue)
        (LshSkew.CapCensus.none(maxBucketSize), newBanded, corpusBanded)
      else {
        val newCounts = newBanded.groupBy(keyCols: _*)
          .agg(count(lit(1)).as("n_new"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // union totals for the batch's buckets only: semi-filter the
        // stored counts by the batch's bucket keys (map-side — the
        // batch side broadcasts), then join tiny-vs-tiny
        val oldForBatch = corpusBuckets
          .join(hinted(newCounts.select(keyCols: _*)), keys, "left_semi")
          .groupBy(keyCols: _*)
          .agg(sum(col("bucket_n")).as("bucket_n"))
        val dropped = newCounts.join(oldForBatch, keys, "left")
          .withColumn("total",
            col("n_new") + coalesce(col("bucket_n"), lit(0L)))
          .filter(col("total") > maxBucketSize)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val censusRow = dropped
          .agg(count(lit(1)), coalesce(sum(col("total")), lit(0L))).head()
        val census = LshSkew.CapCensus(
          censusRow.getLong(0), censusRow.getLong(1), maxBucketSize)
        if (!census.anyDropped) {
          // the common healthy path: neither counts frame is part of
          // the pair plan — release both NOW rather than pinning two
          // dead caches through the candidate join + verify (the same
          // immediate-release discipline as LshSkew.capBuckets)
          dropped.unpersist()
          newCounts.unpersist()
          (census, newBanded, corpusBanded)
        } else {
          caches += newCounts
          caches += dropped
          val guardKeys = dropped.select(keyCols: _*)
          val guard =
            if (census.droppedBuckets <= LshSkew.MaxBroadcastKeys)
              broadcast(guardKeys)
            else guardKeys
          (census,
            newBanded.join(guard, keys, "left_anti"),
            corpusBanded.join(guard, keys, "left_anti"))
        }
      }
    // every pair with ≥ 1 batch member meets in a bucket as
    // (batch row, union row): join the batch side against
    // corpus ∪ batch and canonicalize — batch-batch pairs arrive
    // twice (once per orientation) and collapse in the dedup
    val n = cappedNew.select(keyCols :+ col("id").as("id_n"): _*)
    val u = cappedCorpus.select(keyCols :+ col("id").as("id_u"): _*)
      .unionByName(cappedNew.select(keyCols :+ col("id").as("id_u"): _*))
    val candidates = u.join(hinted(n), keys)
      .filter(col("id_u") =!= col("id_n"))
      .select(least(col("id_u"), col("id_n")).as("id_a"),
              greatest(col("id_u"), col("id_n")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    (candidates, caches.toSeq, census)
  }
}
