package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (north-star ✚): brute-force cosine top-k
  * as the baseline, IVF (centroid-pruned) search as the scale path.
  *
  * Cosine is computed over double-cast arrays with a sequential left
  * fold (`aggregate` over `zip_with`) — the same IEEE operation order a
  * columnar engine uses, so results are bit-identical to the DuckDB
  * oracle's `list_cosine_similarity(CAST(.. AS DOUBLE[]), ..)`.
  *
  * Scale design: the query/centroid side is always the broadcast side —
  * the corpus never shuffles for scoring, only for the per-query top-k
  * (a window over candidates, which IVF keeps small).
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns — the
    * native [[graft.functions.DotProduct]] expression: same IEEE fold
    * order as the `aggregate(zip_with(...))` HOF it replaces (so the
    * bit-parity with the columnar oracle is preserved), but codegen'd
    * instead of interpreted per element.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot(a, b)

  /** Cosine similarity; inputs may be array<float> (cast is exact).
    * Clamped to [-1, 1] — self-similarity folds to 1 + 2ulp otherwise
    * (and columnar engines clamp too, so the oracle expects it).
    * Zero-magnitude vectors yield null, never a clamped NaN: Spark
    * sorts NaN above every double, so an unguarded 0/0 would rank a
    * zero vector as a perfect match.
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val denom = sqrt(dot(ad, ad)) * sqrt(dot(bd, bd))
    when(denom === 0.0, lit(null).cast("double"))
      .otherwise(least(greatest(dot(ad, bd) / denom, lit(-1.0)), lit(1.0)))
  }

  /** Brute-force top-k: score every (query, corpus) pair, keep the k
    * best per query (ties broken by corpus id). Queries are broadcast;
    * the corpus is scanned once, map-side.
    *
    * The top-k itself runs through [[graft.plans.TopK.topKPerKey]]
    * (map-side partial top-k) since r17: a window over the scored
    * cross product would SHUFFLE all |corpus|×|queries| scored rows to
    * rank them (measured at 8 M×20: the exchange dominated the whole
    * search and its wall-clock swung 3× run-to-run with spill
    * pressure); the partial shrinks the exchange to ≤ k rows per query
    * per partition. Same total order (score desc NULLS LAST,
    * neighbor_id asc) → results bit-identical, and the tiny
    * rank-stamping window afterwards sorts ≤ k·queries rows.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    queryIdCol: String = "query_id"): DataFrame = {
    val q = queries.select(col(idCol).as(queryIdCol), col(vecCol).as("q_vec"))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .crossJoin(broadcast(q))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
    rankTopK(scored, queryIdCol, k, "cosine")
  }

  /** Shared kNN tail: prune to the score columns (the vectors must
    * never reach an exchange), exact partial top-k per query, then
    * stamp `rank` with a window over the ≤ k·queries survivors.
    */
  private[ext] def rankTopK(scored: DataFrame, queryIdCol: String, k: Int,
                            scoreCol: String,
                            extraCols: Seq[String] = Nil): DataFrame = {
    val pruned = scored.select(
      (Seq(queryIdCol, "neighbor_id", scoreCol) ++ extraCols).map(col): _*)
    val shrunk = graft.plans.TopK.topKPerKey(pruned, Seq(queryIdCol),
      scoreCol, k, desc = true, tiebreak = Seq("neighbor_id"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col(scoreCol).desc, col("neighbor_id"))
    shrunk
      .withColumn("rank", row_number().over(w))
      .select((Seq(queryIdCol, "neighbor_id", "rank") ++ extraCols :+
        scoreCol).map(col): _*)
  }

  /** Assign every corpus vector to its nearest centroid (argmax cosine,
    * smaller centroid id as tiebreak) — a pure MAP-SIDE scan: the
    * centroid matrix (driver-collected, bounded by
    * [[graft.functions.NearestCentroid.MaxCentroids]] — IVF centroid
    * sets are small by design) rides the plan as a reference object
    * inside one codegen'd [[graft.functions.NearestCentroid]]
    * expression, so assignment adds NO shuffle, NO join, NO
    * aggregation to the corpus scan.
    *
    * This replaces the round-6 `crossJoin(broadcast) + groupBy +
    * max_by(struct)` formulation, whose ARRAY/STRUCT aggregation
    * buffers forced Spark's SortAggregate fallback over the exploded
    * (corpus × centroids) intermediate — measured round 12: 512 M
    * boxed sorted rows at 8 M vectors × 64 centroids, OOM on an 8 g
    * heap. Same results bit-for-bit (same fold/sqrt/clamp cosine, same
    * null-loses / all-null-takes-min-id / tie-takes-min-id contract);
    * the scan shape is what changed.
    *
    * The collect is bounded BEFORE it happens: the plan carries a
    * `limit(MaxCentroids + 1)`, so a mistaken corpus-sized `centroids`
    * input fails the [[graft.functions.NearestCentroid.MaxCentroids]]
    * guard after materializing at most 64 k + 1 rows on the driver —
    * it cannot OOM the driver first. A null centroid id is rejected
    * with an explicit error (the legacy max_by formulation silently let
    * null ids lose every comparison; an id that can never win is a
    * caller bug, not a contract).
    *
    * Note the collect is an EAGER Spark action at plan-construction
    * time: each call (and each [[kmeansTrain]] round, each [[ivfKnn]])
    * re-runs the centroid plan. Callers holding an expensive centroid
    * plan should cache/checkpoint it first — [[kmeansTrain]] does
    * (per-round [[Checkpointing.checkpoint]]).
    */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    import graft.functions.NearestCentroid.MaxCentroids
    val cents = centroids
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .limit(MaxCentroids + 1)
      .collect()
      .map { r =>
        require(!r.isNullAt(0),
          s"assignToCentroids: null centroid $idCol — every centroid needs " +
            "a non-null id (the id is the assignment label and tiebreak)")
        val v =
          if (r.isNullAt(1)) null
          else {
            val s = r.getSeq[Any](1)
            if (s.contains(null)) null
            else s.asInstanceOf[Seq[Double]].toArray
          }
        (r.getLong(0), v)
      }
    corpus.select(col(idCol), col(vecCol))
      .withColumn("centroid_id", graft.functions.NearestCentroid.nearest(
        col(vecCol).cast("array<double>"), cents.toSeq))
  }

  /** Lloyd k-means training over an embedding corpus — the missing
    * half of IVF: [[ivfKnn]] searches with centroids, this builds them
    * from data. Each round = assignToCentroids (centroids broadcast,
    * corpus never shuffles for scoring) + per-cluster mean via the
    * typed [[CentroidAggregator]] (map-side partial sums, dims+1
    * doubles per group shuffle). `localCheckpoint` truncates lineage
    * per round — the DupClusters lesson: without it the plan doubles
    * every iteration; superseded rounds' blocks are freed.
    *
    * Determinism: cluster means are rounded to `roundDp` decimals each
    * round, which absorbs summation-order drift (~1e-13) so repeated
    * runs — and a single-threaded oracle replaying the same seeding
    * and iteration count — stay in bit-identical lockstep.
    *
    * @param seeds initial centroid frame (idCol, vecCol); ids become
    *              cluster ids. Deterministic seeding (e.g. the k
    *              lowest-id vectors) is the caller's choice.
    * @param mode  where per-round state lives ([[CheckpointMode]]:
    *              executor-local default, or a reliable checkpoint dir
    *              for fault-tolerant production runs)
    * @return (idCol, vecCol) centroid frame, vecCol array<double>;
    *         clusters that lose all members drop out (standard Lloyd).
    */
  def kmeansTrain(corpus: DataFrame, seeds: DataFrame, iters: Int, dims: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  roundDp: Int = 6,
                  mode: CheckpointMode = CheckpointMode.Local): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val agg = graft.ext.CentroidAggregator(dims).toColumn
    var (centroids, prevState) = Checkpointing.checkpoint(
      seeds.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol)),
      mode)
    for (_ <- 1 to iters) {
      val assigned = assignToCentroids(corpus, centroids, idCol, vecCol)
      val (next, nextState) = Checkpointing.checkpoint(
        assigned
          .select(col("centroid_id").cast("long"), col(vecCol))
          .as[(Long, Seq[Float])]
          .groupByKey(_._1)
          .mapValues(_._2)
          .agg(agg.name("c"))
          .toDF("cid", "c")
          .select(col("cid").as(idCol),
            transform(col("c"), v => round(v, roundDp)).as(vecCol)),
        mode)
      Checkpointing.free(spark, prevState)
      prevState = nextState
      centroids = next
    }
    centroids
  }

  /** IVF search: rank centroids per query, probe the `nprobe` nearest
    * clusters, and brute-force only inside them. The candidate set per
    * query shrinks by ~numCentroids/nprobe — the standard ANN recall/
    * cost dial. Returns (query_id, neighbor_id, rank, cosine).
    */
  def ivfKnn(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
             k: Int, nprobe: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfKnnPreassigned(assignToCentroids(corpus, centroids, idCol, vecCol),
      centroids, queries, k, nprobe, idCol, vecCol)

  /** [[ivfKnn]] over an ALREADY-ASSIGNED corpus — the serve path of
    * "train once, serve many batches": assignment is the only
    * corpus-sized scan in IVF search, so a persisted
    * (id, vector, centroid_id) frame ([[IvfIndex]]) turns every later
    * query batch into probe-ranking (queries × centroids, broadcast)
    * plus a join that touches only the probed clusters' rows.
    *
    * @param assigned (idCol, vecCol, centroid_id) — the exact output
    *                 shape of [[assignToCentroids]]
    */
  def ivfKnnPreassigned(assigned: DataFrame, centroids: DataFrame,
                        queries: DataFrame, k: Int, nprobe: Int,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val c = centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("cent_vec"))
    val qw = Window.partitionBy(col("query_id"))
      .orderBy(col("qc_cos").desc, col("centroid_id"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(c))
      .withColumn("qc_cos", cosine(col("q_vec"), col("cent_vec")))
      .withColumn("qc_rank", row_number().over(qw))
      .filter(col("qc_rank") <= nprobe)
      .select(col("query_id"), col("q_vec"), col("centroid_id"))
    // same partial-top-k tail as bruteForceKnn (r17): the probed
    // clusters' scored candidates — nprobe/numCentroids of the corpus
    // per query — never shuffle; only ≤ k rows/query/partition do
    rankTopK(assigned
      .withColumnRenamed(idCol, "neighbor_id")
      .join(broadcast(probes), Seq("centroid_id"))
      .withColumn("cosine", cosine(col("q_vec"), col(vecCol))),
      "query_id", k, "cosine")
  }

  /** Deterministic Rademacher (±1) hyperplanes for sign-random-
    * projection LSH: sign(p, i) = +1 iff the first hex digit of
    * md5("srp<p>_<i>") is >= '8'. Derivable in ANY engine with md5 —
    * the oracle rebuilds the identical planes in SQL, no shipped state.
    */
  def srpPlanes(numPlanes: Int, dims: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { p =>
      (0 until dims).map { i =>
        md.reset()
        val h = md.digest(s"srp${p}_${i}".getBytes("UTF-8"))
        if ((h(0) & 0x80) != 0) 1.0 else -1.0
      }
    }
  }

  /** Per-band SRP bucket ids: band b's bucket packs `planesPerBand`
    * sign bits (bit p set iff round(v·plane, 6) >= 0 — rounded so an
    * at-the-boundary dot can't flip between engines on summation-order
    * ulps). Map-side only; broadcast-free (planes are plan literals).
    */
  def srpBuckets(vec: Column, numBands: Int, planesPerBand: Int,
                 dims: Int): Column = {
    val planes = srpPlanes(numBands * planesPerBand, dims)
    val vd = vec.cast("array<double>")
    array((0 until numBands).map { b =>
      (0 until planesPerBand).map { p =>
        val plane = array(planes(b * planesPerBand + p).map(lit): _*)
        when(round(dot(vd, plane), 6) >= 0.0, lit(1L << p)).otherwise(0L)
      }.reduce(_ + _)
    }: _*)
  }

  /** SRP-LSH near-duplicate pairs — the embedding analog of the
    * MinHash-LSH text path (and the scale path behind the brute-force
    * [[cosine]] cross join): bucket per band map-side, self-join on
    * (band, bucket) with ids only, then exact-cosine verify on the
    * candidates. Recall is the standard SRP curve
    * (1 - (1 - (1 - θ/π)^planesPerBand)^numBands); more bands buy
    * recall linearly in candidate cost, never quadratically in corpus.
    *
    * `maxBucketSize` defaults FINITE ([[LshSkew.DefaultMaxBucketSize]])
    * for the same reason as [[Dedup.lshNearDupPairs]]: one degenerate
    * bucket (the all-zeros embedding) makes the self-join quadratic.
    * Uncapped is an explicit opt-in via [[LshSkew.NoCap]].
    */
  def srpNearDupPairs(df: DataFrame, threshold: Double,
                      numBands: Int, planesPerBand: Int, dims: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      maxBucketSize: Int = LshSkew.DefaultMaxBucketSize): DataFrame =
    srpNearDupPairsWithStats(df, threshold, numBands, planesPerBand, dims,
      idCol, vecCol, maxBucketSize)._1

  /** [[srpNearDupPairs]] plus the skew-guard [[LshSkew.CapCensus]] —
    * the dropped-bucket count/mass as a returned fact, so corpus-scale
    * runs can assert zero drops instead of grepping logs (the text
    * path's [[Dedup.lshNearDupPairsWithStats]] contract).
    */
  def srpNearDupPairsWithStats(
      df: DataFrame, threshold: Double,
      numBands: Int, planesPerBand: Int, dims: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBucketSize: Int = LshSkew.DefaultMaxBucketSize): (DataFrame, LshSkew.CapCensus) = {
    val (pairs, caches, census) = srpNearDupPairsLazy(df, threshold, numBands,
      planesPerBand, dims, idCol, vecCol, maxBucketSize)
    // materialize then release the bucketed cache (the Dedup.lshNearDupPairs
    // discipline): the pair list is tiny next to the bucketed corpus.
    // unpersist in finally — a failed/cancelled checkpoint must not pin
    // the corpus in the executor cache for the session's lifetime
    try (pairs.localCheckpoint(true), census)
    finally caches.foreach(_.unpersist())
  }

  /** Lazy variant: un-materialized pair plan + the persisted
    * intermediate the caller must unpersist (exists so tests can
    * assert plan shape before checkpointing truncates lineage) + the
    * skew-guard census.
    */
  private[graft] def srpNearDupPairsLazy(
      df: DataFrame, threshold: Double,
      numBands: Int, planesPerBand: Int, dims: Int,
      idCol: String, vecCol: String,
      maxBucketSize: Int = LshSkew.DefaultMaxBucketSize): (DataFrame, Seq[DataFrame], LshSkew.CapCensus) = {
    // persist: the banded explode plus BOTH verify joins re-reference
    // this frame — without a cache the scan and the full
    // numBands×planesPerBand dot-product battery run three times
    val bucketed = df
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        srpBuckets(col(vecCol), numBands, planesPerBand, dims).as("buckets"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = bucketed
      .select(col("id"), posexplode(col("buckets")).as(Seq("band_idx", "bucket")))
    val (capped, guardCaches, census) = LshSkew.capBuckets(banded,
      Seq("band_idx", "bucket"), maxBucketSize, "srpNearDupPairs")
    val a = capped.select(col("band_idx"), col("bucket"), col("id").as("id_a"))
    val b = capped.select(col("band_idx"), col("bucket"), col("id").as("id_b"))
    val pairs = a.join(b, Seq("band_idx", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(bucketed.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(bucketed.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
    (pairs, bucketed +: guardCaches, census)
  }

  /** The SRP analog of [[Dedup.bandedFrame]]: (base, banded) where
    * base = (id, v array<double>) — the verify payload per vector —
    * and banded = (id, band_idx, bucket), both persisted (the counts,
    * the candidate join, and both verify joins re-reference them).
    * Callers own the unpersist. Values are BIT-IDENTICAL to the full
    * [[srpNearDupPairsLazy]] path's by construction: same
    * [[srpBuckets]] planes (deterministic md5 derivation), same
    * exact float→double cast — which is what lets [[SrpIndex]] prove
    * incremental ≡ full-recompute-restricted with a hash equality.
    */
  private[graft] def srpFrames(df: DataFrame, idCol: String, vecCol: String,
                               numBands: Int, planesPerBand: Int,
                               dims: Int): (DataFrame, DataFrame) = {
    val base = df
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = base
      .select(col("id"), posexplode(
        srpBuckets(col("v"), numBands, planesPerBand, dims))
        .as(Seq("band_idx", "bucket")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (base, banded)
  }

  /** Incremental SRP near-dup over ALREADY-banded batch frames against
    * persisted corpus frames (the [[SrpIndex]] layout) — the embedding
    * twin of [[Dedup.lshNearDupPairsIncrementalFromFrames]], sharing
    * its candidate machinery ([[LshIncremental.candidates]]: stored-
    * counts union capping, size-guarded batch-side broadcast, corpus
    * frames consumed map-side) with only the verify step differing:
    * exact cosine over the stored double vectors instead of Jaccard
    * over shingle-hash sets. The verify joins stay UN-hinted for the
    * same reason as the text path's — candidate volume is runtime-
    * data-dependent, so AQE is the safe broadcaster there.
    */
  private[graft] def srpNearDupPairsIncrementalFromFrames(
      corpusBase: DataFrame, corpusBanded: DataFrame, corpusBuckets: DataFrame,
      newBase: DataFrame, newBanded: DataFrame,
      threshold: Double, maxBucketSize: Int)
      : (DataFrame, Seq[DataFrame], LshSkew.CapCensus) = {
    val (candidates, caches, census) = LshIncremental.candidates(
      corpusBanded, corpusBuckets, newBanded,
      Seq("band_idx", "bucket"), maxBucketSize)
    val unionBase = corpusBase.select(col("id"), col("v"))
      .unionByName(newBase.select(col("id"), col("v")))
    val pairs = candidates
      .join(unionBase.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(unionBase.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
    (pairs, caches, census)
  }
}
