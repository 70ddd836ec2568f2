package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster election: connected components over a near-dup
  * pair graph, labeling every document with the minimum doc id of its
  * component (the kept representative). The missing last step of every
  * dedup pipeline — pairs alone over-delete when A~B and B~C but A≁C.
  *
  * Two interchangeable algorithms, same output contract:
  *
  *  - [[components]] — iterative min-label propagation. Rounds needed
  *    = graph diameter, one shuffle per round. The right pick for
  *    near-dup graphs, whose clusters are dense (diameter 2–3).
  *  - [[componentsStar]] — alternating big-star/small-star (Kiveris
  *    et al. 2014, "Connected Components in MapReduce and Beyond").
  *    Rounds = O(log n) REGARDLESS of diameter, so a million-hop
  *    chain finishes in ~20 rounds where min-label would need a
  *    million. Two grouped-join shuffles per round. The large-graph
  *    path for arbitrary edge sets at 100 TB scale.
  *
  * Both throw on iteration-budget exhaustion rather than silently
  * returning unconverged (= wrong) labels.
  */
object DupClusters {

  /** Per-round lineage truncation, shared by both algorithms: each
    * round's plan embeds the prior round's twice (next + convergence
    * check), so without truncation the logical plan grows 2^rounds and
    * the analyzer OOMs on deep chains. The WHERE of the truncated
    * state is the caller's [[CheckpointMode]] — executor-local blocks
    * (default; fastest, non-fault-tolerant) or a reliable checkpoint
    * dir (production clusters). Superseded rounds' state is freed
    * explicitly via [[Checkpointing]] handles, so a long run holds at
    * most two rounds of state, not all of them.
    */
  // NOTE (Reliable mode): superseded rounds are freed each iteration,
  // but the FINAL round's checkpoint files back the returned frame and
  // stay under the mode's dir — end-of-life cleanup of that dir is the
  // caller's, after consuming the result (see CheckpointMode.Reliable).
  private def checkpointTracked(df: DataFrame, mode: CheckpointMode)
      : (DataFrame, Checkpointing.Handle) =
    Checkpointing.checkpoint(df, mode)

  private def free(spark: SparkSession, h: Checkpointing.Handle): Unit =
    Checkpointing.free(spark, h)

  /** Label every node with its component's min node id, by min-label
    * propagation: each round joins labels to the symmetric edge list,
    * takes the min neighbor label, and stops when no label changes.
    *
    * Rounds needed = graph diameter; throws if `maxIter` rounds pass
    * without convergence (a silently returned unconverged frame would
    * mislabel any chain longer than `maxIter` hops). For graphs whose
    * diameter may exceed a small constant, use [[componentsStar]].
    *
    * @param edges (s, t) pair frame, undirected (one direction enough)
    * @param nodes (id) frame: all nodes incl. singletons
    * @param mode  where per-round state lives ([[CheckpointMode]])
    */
  def components(edges: DataFrame, nodes: DataFrame,
                 maxIter: Int = 20,
                 mode: CheckpointMode = CheckpointMode.Local): DataFrame = {
    val spark = edges.sparkSession
    val sym = edges.select(col("s"), col("t"))
      .union(edges.select(col("t").as("s"), col("s").as("t")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var (labels, labelIds) =
      checkpointTracked(nodes.select(col("id"), col("id").as("label")), mode)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val neigh = sym.join(labels, sym("s") === labels("id"))
        .groupBy(col("t").as("nid")).agg(min(col("label")).as("nlabel"))
      val (next, nextIds) = checkpointTracked(
        labels.join(neigh, labels("id") === neigh("nid"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label")),
        mode)
      changed = next.as("n")
        .join(labels.withColumnRenamed("label", "old").as("o"), "id")
        .filter(col("label") =!= col("old")).count()
      free(spark, labelIds) // convergence count above was the last reader
      labels = next
      labelIds = nextIds
      i += 1
    }
    sym.unpersist()
    if (changed > 0) {
      free(spark, labelIds)
      throw new IllegalStateException(
        s"DupClusters.components did not converge in $maxIter rounds " +
          s"($changed labels still changing): the graph diameter exceeds " +
          "the iteration budget. Raise maxIter, or use componentsStar " +
          "(O(log n) rounds regardless of diameter).")
    }
    labels // final round stays checkpointed: it is the returned frame
  }

  /** One large-star round: every node connects its LARGER neighbors to
    * the minimum of its neighborhood (incl. itself). Operates on the
    * symmetrized edge list; one groupBy + one join shuffle, both on
    * node id.
    */
  private[graft] def largeStar(e: DataFrame): DataFrame = {
    // no input distinct: duplicate edges can't change the min-agg or the
    // emitted pairs (the round's OUTPUT distinct bounds growth), and
    // without it the groupBy and the join below shuffle the IDENTICAL
    // frame on the identical key — one reusable exchange instead of a
    // dedup shuffle plus two more
    val sym = e.union(e.select(col("t").as("s"), col("s").as("t")))
    val mins = sym.groupBy(col("s").as("u")).agg(min(col("t")).as("mn"))
    sym.join(mins, sym("s") === mins("u"))
      .filter(col("t") > col("s"))
      .select(col("t").as("s"), least(col("u"), col("mn")).as("t"))
      .distinct()
  }

  /** One small-star round: edges oriented larger→smaller, every node
    * connects its (all smaller) neighbors and itself to its minimum
    * neighbor. Same two-shuffle shape as [[largeStar]].
    */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    // input distinct elided for the same exchange-reuse reason as
    // [[largeStar]]; orientation alone is enough for correctness
    val or = e.select(greatest(col("s"), col("t")).as("s"),
        least(col("s"), col("t")).as("t"))
      .filter(col("s") =!= col("t"))
    val mins = or.groupBy(col("s").as("u")).agg(min(col("t")).as("mn"))
    val j = or.join(mins, or("s") === mins("u"))
    j.select(col("t").as("s"), col("mn").as("t"))
      .union(j.select(col("u").as("s"), col("mn").as("t")))
      .filter(col("s") =!= col("t"))
      .distinct()
  }

  /** Label every node with its component's min node id, by alternating
    * big-star/small-star contraction. Converges in O(log n) rounds for
    * ANY graph shape — the large-diameter-safe path that min-label
    * propagation is not. Each round costs two grouped-join shuffles
    * (vs one for min-label), so prefer [[components]] when the
    * diameter is known small (e.g. near-dup clusters).
    *
    * Convergence = the edge set reaches a fixed point (a star forest
    * whose centers are the component minima), detected by an
    * order-free fingerprint (count + bit_xor of xxhash64) staying
    * stable across a round — then CONFIRMED exactly: XOR-folding is
    * linear, so two distinct edge sets of equal count can collide in
    * the fingerprint, and a false positive here would silently return
    * non-star-forest edges (the failure mode the budget throw exists
    * to prevent). The confirm is one `except` (set-minus) run ONLY on
    * the round the fingerprint first reports stable: equal counts +
    * empty `next − e` ⇒ the two distinct sets are equal. Steady-state
    * rounds pay the cheap fingerprint alone. Throws on budget
    * exhaustion.
    *
    * One checkpointed round per check is the MEASURED optimum, not an
    * oversight: batching two contraction rounds per checkpoint (to
    * halve per-round job scheduling, the q91 chain's dominant cost)
    * was tried and is ~3× SLOWER on the 50-hop-chain fixture (warm
    * 3.3 s → 9.7 s at local[32]) — each star self-joins its input, so
    * an unmaterialized inner round recomputes per reference, and a
    * lazy persist boundary (InMemoryRelation) breaks the per-round
    * exchange reuse that makes the checkpointed shape cheap (groupBy
    * and join shuffle the IDENTICAL checkpointed frame — one reusable
    * exchange). The per-round overhead is the honest O(log n) floor.
    */
  def componentsStar(edges: DataFrame, nodes: DataFrame,
                     maxIter: Int = 50,
                     mode: CheckpointMode = CheckpointMode.Local): DataFrame = {
    val spark = edges.sparkSession
    var (e, eIds) = checkpointTracked(
      edges.select(col("s"), col("t")).filter(col("s") =!= col("t")), mode)
    var prev: (Long, Long) = (-1L, 0L)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val (next, nextIds) = checkpointTracked(smallStar(largeStar(e)), mode)
      val row = next.agg(
        count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("s"), col("t"))), lit(0L)).as("sig")).head()
      val sig = (row.getLong(0), row.getLong(1))
      // fingerprint match is necessary but (theoretically) not
      // sufficient: confirm set equality exactly before declaring the
      // star forest. Both frames are round outputs (distinct), so
      // equal count + empty (next − e) ⇒ next = e.
      converged = sig == prev && next.except(e).isEmpty
      prev = sig
      free(spark, eIds)
      e = next
      eIds = nextIds
      i += 1
    }
    if (!converged) {
      free(spark, eIds)
      throw new IllegalStateException(
        s"DupClusters.componentsStar did not converge in $maxIter rounds " +
          "— raise maxIter (expected rounds are O(log n) in node count).")
    }
    // e is now a star forest: (member, root) with root = component min.
    // The defensive min-agg collapses any duplicate star edge instead
    // of fanning the node out into two label rows.
    val labels = nodes.select(col("id"))
      .join(e.select(col("s").as("id"), col("t").as("root")), Seq("id"), "left")
      .groupBy(col("id"))
      .agg(min(coalesce(col("root"), col("id"))).as("label"))
    val (out, _) = checkpointTracked(labels, mode) // eager: reads e's state now
    free(spark, eIds)
    out
  }

  /** Cluster summary: representative (min id) and member count, for
    * clusters with at least `minSize` members.
    */
  def clusters(edges: DataFrame, nodes: DataFrame,
               minSize: Int = 2,
               mode: CheckpointMode = CheckpointMode.Local): DataFrame =
    components(edges, nodes, mode = mode)
      .groupBy(col("label").as("rep"))
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") >= minSize)

  /** Small-graph fast-path bound shared by the two incremental faces
    * ([[incrementalComponents]], [[removeFromLabeling]]): their CC
    * inputs are batch-/takedown-sized BY CONSTRUCTION (that is the
    * whole point of the incremental contracts), and running O(log n)
    * distributed rounds over a few thousand edges prices pure job-
    * scheduling overhead — measured at the q113/q114 gates, each
    * distributed quotient CC costs ~2.5–3 s of rounds for microsecond
    * union-find work. Under this many edges the edge list is
    * COLLECTED (two longs per edge — 16 MB at the bound, the same
    * driver-size class as [[LshSkew.MaxBroadcastKeys]] broadcasts)
    * and solved exactly driver-side; above it, or for non-long id
    * types, the distributed [[componentsStar]] path runs unchanged.
    * [[componentsStar]] itself deliberately has NO such fast path —
    * it is the large-graph algorithm, and its gates (q91's
    * adversarial chains) must keep exercising the distributed rounds.
    */
  private[graft] val LocalCcMaxEdges: Long = 1000000L

  /** Exact driver-side CC over a collected edge list: union-find with
    * min-id roots (every union parents the larger root under the
    * smaller, so a component's final root IS its minimum member id —
    * the same canonical labels the distributed paths elect). Returns
    * labels for edge ENDPOINTS only, identity rows omitted — exactly
    * the `roots.filter(id =!= label)` shape the remap joins consume.
    */
  private[ext] def unionFindRoots(pairs: Array[(Long, Long)]): Seq[(Long, Long)] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val next = parent(c); parent(c) = r; c = next
      }
      r
    }
    pairs.foreach { case (s, t) =>
      val rs = find(s); val rt = find(t)
      if (rs != rt) parent(math.max(rs, rt)) = math.min(rs, rt)
    }
    val endpoints = scala.collection.mutable.LinkedHashSet.empty[Long]
    pairs.foreach { case (s, t) => endpoints += s; endpoints += t }
    endpoints.iterator.map(x => (x, find(x))).filter(p => p._1 != p._2).toSeq
  }

  private[ext] def allLongIds(df: DataFrame): Boolean =
    df.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.LongType)

  /** The REMOVAL face of the incremental cluster story — the takedown
    * twin of [[incrementalComponents]] ([[graft.ext.LshIndex.remove]]
    * removes documents from the INDEX; this removes them from a
    * persisted LABELING): drop the removed ids and re-elect labels for
    * the components they touched, in O(touched components) — the
    * corpus-sized labeling is scanned map-side (two passes, zero
    * shuffles) and NEVER shuffled. Without this, a removed document
    * could stay a cluster's canonical min-id representative forever —
    * every later batch keeps electing a representative that no longer
    * exists (a compliance problem, not just staleness), and the only
    * alternative is a full corpus re-election per takedown.
    *
    * Why re-ELECTION and not just re-labeling: removal can SPLIT a
    * component (A–B–C with B removed and A~C only through B), so the
    * touched components' structure must be recomputed from their
    * SURVIVING edges. `survivorEdges` supplies them: it receives the
    * touched components' surviving member ids and must return the
    * (s, t) near-dup pairs among them under the CURRENT corpus — in
    * the LSH pipeline that is [[graft.ext.LshIndex.pairsAmong]]
    * against the post-remove index (tombstone-masked, O(touched), no
    * text re-shingled). Exact CC then runs on that subset-sized graph
    * ([[componentsStar]] — budget-safe for any shape).
    *
    * Exactness: the old labeling's components are the old edge set's
    * components, and edges never cross components — so removing
    * vertices leaves every UNTOUCHED component (no removed member)
    * bit-identical, its min-id label still a live member, while each
    * touched component's survivors form an induced subgraph fully
    * re-solved here. The composition therefore equals a full CC over
    * the survivor graph — oracle-proven end-to-end by the q114 gate
    * (remove, then fold a batch in: hash-equals the full recompute
    * over (corpus ∖ removed) ∪ batch; reference contract anchor: the
    * dedup metadata-consistency semantics of `df_helpers.py:287-336` —
    * keys must stay valid under mutation). Caveat shared with every
    * maintenance face: under an ACTIVE bucket cap, a removal can drop
    * a bucket back under the cap and resurrect pairs in components it
    * did not touch; those are outside `survivorEdges`' view, so
    * cap-regime exactness covers the touched components only (the
    * full-re-election answer is a corpus [[componentsStar]] rebuild).
    * The caveat is EXECUTABLE since r15: `LshIndex.remove` /
    * `SrpIndex.remove` return a [[LshSkew.RemovalReport]] whose
    * `anyUncapped` flags exactly this regime — gate the repair on it
    * (q114/q116 do).
    *
    * Idempotent: already-removed and never-labeled ids touch nothing.
    *
    * @param prevLabels     complete (id, label) labeling, labels =
    *                       canonical min member ids
    * @param removedIds     frame whose FIRST column is the removed id
    * @param survivorEdges  touched surviving ids (id) ⇒ (s, t) pairs
    *                       among them under the current corpus
    * @return (id, label) over prevLabels ∖ removedIds — same shape as
    *         [[components]], so the result can seed the next batch's
    *         [[incrementalComponents]]
    */
  def removeFromLabeling(prevLabels: DataFrame, removedIds: DataFrame,
                         survivorEdges: DataFrame => DataFrame,
                         maxIter: Int = 50,
                         mode: CheckpointMode = CheckpointMode.Local,
                         localCcMaxEdges: Long = LocalCcMaxEdges)
      : DataFrame = {
    val core = touchedRelabel(prevLabels, removedIds, survivorEdges,
      maxIter, mode, localCcMaxEdges)
    try {
      // second map-side labeling scan: untouched survivors pass
      // through label-unchanged (their min-id rep is still a member)
      val untouched = prevLabels
        .join(core.hintedRem(core.rem), Seq("id"), "left_anti")
        .join(core.hintedTouched(core.touchedLabels), Seq("label"),
          "left_anti")
        .select(col("id"), col("label"))
      untouched.unionByName(core.relabeled).localCheckpoint(true)
    } finally core.caches.foreach(_.unpersist())
  }

  /** The removal face's shared core ([[removeFromLabeling]] returns
    * the pruned labeling; [[LabelStore.remove]] persists the SAME
    * relabeling as delta overrides): removed-id extraction, the
    * touched-component scan, the survivor re-pair, and the exact
    * subset CC. `relabeled` covers ALL surviving members of touched
    * components with their re-elected labels; `caches` are owned by
    * the caller (unpersist after the action).
    */
  private[ext] final case class TouchedRelabel(
      rem: DataFrame, touchedLabels: DataFrame, relabeled: DataFrame,
      hintedRem: DataFrame => DataFrame,
      hintedTouched: DataFrame => DataFrame, caches: Seq[DataFrame])

  private[ext] def touchedRelabel(prevLabels: DataFrame,
                                  removedIds: DataFrame,
                                  survivorEdges: DataFrame => DataFrame,
                                  maxIter: Int, mode: CheckpointMode,
                                  localCcMaxEdges: Long): TouchedRelabel = {
    // the caller owns the caches ONLY once this returns; on any throw
    // before that (survivorEdges callback, componentsStar budget) the
    // partial persists are released here — the pre-factor try/finally
    // window, kept closed
    val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def cached(df: DataFrame): DataFrame = {
      val c = df.persist(StorageLevel.MEMORY_AND_DISK); caches += c; c
    }
    try {
      val rem = cached(removedIds
        .select(col(removedIds.columns.head).as("id")).distinct())
      val nRem = rem.count() // sizes the hint; materializes the cache
      def hintedR(df: DataFrame): DataFrame =
        if (nRem <= LshSkew.MaxBroadcastKeys) broadcast(df) else df
      // labels of components that lost ≥ 1 member — takedown-sized (≤
      // one per removed id). The extraction is the first of the two
      // map-side labeling scans.
      val touchedLabels = cached(
        prevLabels.join(hintedR(rem), Seq("id"), "left_semi")
          .select(col("label")).distinct())
      val nTouched = touchedLabels.count()
      def hintedT(df: DataFrame): DataFrame =
        if (nTouched <= LshSkew.MaxBroadcastKeys) broadcast(df) else df
      val touchedMembers = cached(prevLabels
        .join(hintedR(rem), Seq("id"), "left_anti")
        .join(hintedT(touchedLabels), Seq("label"), "left_semi")
        .select(col("id")))
      val edges = cached(
        survivorEdges(touchedMembers).select(col("s"), col("t")))
      val sparkS = prevLabels.sparkSession
      import sparkS.implicits._
      // takedown-sized edge set ⇒ driver union-find (LocalCcMaxEdges
      // scaladoc); the distributed path is the same-output fallback
      val relabeled =
        if (edges.count() <= localCcMaxEdges && allLongIds(edges)) {
          val roots = unionFindRoots(
            edges.collect().map(r => (r.getLong(0), r.getLong(1))))
          touchedMembers
            .join(broadcast(roots.toDF("id", "newl")), Seq("id"), "left")
            .select(col("id"), coalesce(col("newl"), col("id")).as("label"))
        } else componentsStar(edges, touchedMembers, maxIter, mode)
      TouchedRelabel(rem, touchedLabels, relabeled, hintedR, hintedT,
        caches.reverse.toSeq)
    } catch {
      case t: Throwable => caches.foreach(_.unpersist()); throw t
    }
  }

  /** Corpus-growth connected components — the cluster-election half of
    * the incremental dedup story ([[graft.ext.LshIndex.incrementalPairs]]
    * makes the PAIRS O(batch); without this, electing representatives
    * still re-ran CC over the corpus-wide pair graph per batch):
    * update a prior labeling with a batch of new nodes and the
    * batch-touching edges, in O(batch + touched components) — the
    * corpus-sized labeling is scanned once map-side and NEVER
    * shuffled.
    *
    * Algorithm — exact CC on the QUOTIENT graph: the prior labeling's
    * components are precisely the connected components of the old
    * edge set, so contracting every new edge's endpoints to their
    * prior labels (identity for new nodes) yields a graph whose CC
    * solution, composed with the prior labeling, IS the CC solution
    * of the full union graph. The quotient has O(batch edges) edges
    * and only TOUCHED component labels + new nodes as vertices, so
    * [[componentsStar]] over it costs O(batch); the final remap joins
    * the corpus labeling against the (size-guarded broadcast) quotient
    * roots map-side. Canonical min-id labels compose exactly: a merged
    * component's min member id = min over its parts' min ids, which
    * is the quotient CC's min over label-vertices.
    *
    * Spec-pinned ≡ a full recompute over the union graph
    * (DupClustersSpec), and oracle-gated end-to-end by q113 — whose
    * oracle IS q47's full-recompute SQL, the q107 ≡ q62 pattern.
    *
    * Caller contract: `prevLabels` is a COMPLETE labeling of the old
    * node set (the [[components]]/[[componentsStar]] output, labels =
    * canonical min member ids); `newNodes` are disjoint from it; every
    * `newEdges` endpoint is in `prevLabels` ∪ `newNodes` (edges
    * between two OLD nodes are fine — that is the merge case).
    *
    * @return (id, label) over prevLabels ∪ newNodes — same shape as
    *         [[components]], so the result can seed the NEXT batch.
    */
  def incrementalComponents(prevLabels: DataFrame, newNodes: DataFrame,
                            newEdges: DataFrame, maxIter: Int = 50,
                            mode: CheckpointMode = CheckpointMode.Local)
      : DataFrame = {
    val (remapped, caches) = incrementalComponentsLazy(prevLabels, newNodes,
      newEdges, maxIter, mode, LshSkew.MaxBroadcastKeys)
    try remapped.localCheckpoint(true)
    finally caches.foreach(_.unpersist())
  }

  /** Lazy core of [[incrementalComponents]] (the Dedup `*Lazy`
    * pattern): the quotient CC runs eagerly (componentsStar
    * checkpoints per round by construction), but the returned REMAP
    * plan — the face's whole scale claim, "the corpus labeling never
    * shuffles" — is un-materialized so DupClustersSpec can pin its
    * executed shape in both regimes: under `maxBroadcastKeys` the
    * roots ride an explicit broadcast and the labeling flows map-side
    * (no exchange), above it the hint is withheld and Spark's shuffle
    * fallback fires (a quotient too big to broadcast cannot be forced
    * through the driver — correct, just no longer shuffle-free).
    * `maxBroadcastKeys` also bounds the driver union-find fast path
    * (min with [[LocalCcMaxEdges]] — an edge list small enough to
    * collect is the same driver-size class as a broadcastable one),
    * so passing 0 forces BOTH the distributed quotient CC and the
    * shuffle remap: the spec's full-fallback regime, and the
    * regime-equality assertion doubles as the local ≡ distributed CC
    * pin. Returned caches are owned by the caller (unpersist after
    * the action).
    */
  private[graft] def incrementalComponentsLazy(
      prevLabels: DataFrame, newNodes: DataFrame, newEdges: DataFrame,
      maxIter: Int, mode: CheckpointMode, maxBroadcastKeys: Long)
      : (DataFrame, Seq[DataFrame]) = {
    val (roots, caches) = quotientRoots(prevLabels, newNodes, newEdges,
      maxIter, mode, maxBroadcastKeys)
    // the roots frame is already materialized (componentsStar
    // checkpoints its output), so sizing its own hint is a cheap
    // count — and unlike nEdges it also covers a huge newNodes set
    val rootMap =
      if (roots.count() <= maxBroadcastKeys) broadcast(roots)
      else roots
    // remap: corpus labeling scanned once, map-side left join against
    // the touched-roots map; untouched components coalesce through
    val remappedOld = prevLabels
      .join(rootMap.select(col("id").as("label"), col("label").as("newl")),
        Seq("label"), "left")
      .select(col("id"), coalesce(col("newl"), col("label")).as("label"))
    val remappedNew = newNodes.select(col("id"))
      .join(rootMap.select(col("id"), col("label").as("newl")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("newl"), col("id")).as("label"))
    (remappedOld.unionByName(remappedNew), caches)
  }

  /** The incremental faces' shared quotient solver
    * ([[incrementalComponentsLazy]] remaps a labeling in place;
    * [[LabelStore.foldBatch]] persists the same roots as delta rows):
    * contract each new edge's endpoints to their prior labels — the
    * ONE corpus-sized operation is extracting the touched ids' labels,
    * with the corpus labeling streaming map-side against the
    * (size-guard-hinted) touched-id set — then solve exact CC over the
    * O(batch) quotient. Returns the NON-IDENTITY root entries
    * `(id, label)` (quotient vertex → final min-id root; vertices that
    * keep their label are omitted, which is exactly what the remap
    * joins consume) plus the caches the caller owns.
    */
  private[ext] def quotientRoots(prevLabels: DataFrame,
                                 newNodes: DataFrame, newEdges: DataFrame,
                                 maxIter: Int, mode: CheckpointMode,
                                 maxBroadcastKeys: Long)
      : (DataFrame, Seq[DataFrame]) = {
    // same on-failure cache release discipline as [[touchedRelabel]]
    val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def cached(df: DataFrame): DataFrame = {
      val c = df.persist(StorageLevel.MEMORY_AND_DISK); caches += c; c
    }
    try {
      val edges = cached(newEdges.select(col("s"), col("t")))
      val nEdges = edges.count() // sizes the hints; materializes the cache
      def hinted(df: DataFrame): DataFrame =
        if (nEdges <= maxBroadcastKeys) broadcast(df) else df
      val touched = edges.select(col("s").as("id"))
        .union(edges.select(col("t").as("id"))).distinct()
      val touchedLabels = cached(prevLabels.join(hinted(touched), Seq("id")))
      val contracted = cached(edges
        .join(touchedLabels.select(col("id").as("s"), col("label").as("ls")),
          Seq("s"), "left")
        .join(touchedLabels.select(col("id").as("t"), col("label").as("lt")),
          Seq("t"), "left")
        .select(coalesce(col("ls"), col("s")).as("s"),
                coalesce(col("lt"), col("t")).as("t")))
      // exact CC over the quotient — O(batch) vertices/edges. Batch-
      // sized edge set ⇒ driver union-find (LocalCcMaxEdges scaladoc:
      // new singletons need no CC, and only edge endpoints can remap,
      // so the collected work is the contracted edge list alone);
      // larger, or non-long ids ⇒ the distributed componentsStar path,
      // budget-safe for any merge-chain shape (the q91 lesson)
      val sparkS = prevLabels.sparkSession
      val roots =
        if (nEdges <= math.min(LocalCcMaxEdges, maxBroadcastKeys) &&
            allLongIds(contracted)) {
          import sparkS.implicits._
          unionFindRoots(contracted.collect().map(r =>
            (r.getLong(0), r.getLong(1)))).toDF("id", "label")
        } else {
          val quotientNodes = contracted.select(col("s").as("id"))
            .union(contracted.select(col("t").as("id")))
            .union(newNodes.select(col("id"))).distinct()
          componentsStar(contracted, quotientNodes, maxIter, mode)
            .filter(col("id") =!= col("label")) // identity rows remap nothing
        }
      (roots, caches.reverse.toSeq)
    } catch {
      case t: Throwable => caches.foreach(_.unpersist()); throw t
    }
  }
}
