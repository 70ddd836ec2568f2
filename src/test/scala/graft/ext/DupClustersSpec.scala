package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Connected-components label propagation: chains, singletons,
  * multi-component graphs, transitivity (A~B~C without A~C).
  */
class DupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("labels chains transitively and keeps singletons") {
    // components: {1,2,3} (chain), {5,6}, {9} singleton
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("s", "t")
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("id")
    val labels = DupClusters.components(edges, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L)
  }

  test("clusters reports representatives with member counts") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("s", "t")
    val nodes = (10L to 12L).union(Seq(20L, 21L, 30L)).toDF("id")
    val out = DupClusters.clusters(edges, nodes).orderBy("rep")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    out shouldBe Array((10L, 3L), (20L, 2L))
  }

  test("long chain converges within iteration budget") {
    val n = 12
    val edges = (1 until n).map(i => (i.toLong, i.toLong + 1)).toDF("s", "t")
    val nodes = (1 to n).map(_.toLong).toDF("id")
    val labels = DupClusters.components(edges, nodes)
      .collect().map(_.getLong(1)).distinct
    labels shouldBe Array(1L)
  }

  test("min-label THROWS instead of mislabeling when diameter exceeds maxIter") {
    // 50-hop chain: label 1 must walk 50 hops; 20 rounds can't do it
    val edges = (1 until 51).map(i => (i.toLong, i.toLong + 1)).toDF("s", "t")
    val nodes = (1 to 51).map(_.toLong).toDF("id")
    val ex = intercept[IllegalStateException] {
      DupClusters.components(edges, nodes, maxIter = 20).collect()
    }
    ex.getMessage should include("did not converge")
  }

  test("big-star/small-star labels a 50-hop chain in O(log n) rounds") {
    val edges = (1 until 51).map(i => (i.toLong, i.toLong + 1)).toDF("s", "t")
    val nodes = (1 to 51).map(_.toLong).toDF("id")
    val labels = DupClusters.componentsStar(edges, nodes, maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    labels.length shouldBe 51
    labels.foreach { case (_, l) => l shouldBe 1L }
  }

  test("star convergence is exact-confirmed, not fingerprint-trusted") {
    // The per-round stability check is a linear (count, xor-of-hash)
    // fingerprint, and linear folds CAN collide across distinct
    // equal-count edge sets — a false positive would return non-star-
    // forest edges and silently mislabel. componentsStar therefore
    // runs ONE exact set-equality confirm (next.except(e).isEmpty) on
    // the round the fingerprint first reports stable. This case pins
    // the behavior the confirm protects: a graph needing several
    // contraction rounds still labels exactly, and a budget of 1 round
    // (fingerprint can never have stabilized yet) throws rather than
    // returning the unconverged intermediate.
    val edges = (1 until 30).map(i => (i.toLong, i.toLong + 1)).toDF("s", "t")
    val nodes = (1 to 30).map(_.toLong).toDF("id")
    val labels = DupClusters.componentsStar(edges, nodes)
      .collect().map(_.getLong(1)).distinct
    labels shouldBe Array(1L)
    val ex = intercept[IllegalStateException] {
      DupClusters.componentsStar(edges, nodes, maxIter = 1).collect()
    }
    ex.getMessage should include("did not converge")
  }

  test("big-star/small-star matches min-label on a multi-component graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 7L)).toDF("s", "t")
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 7L, 8L, 9L).toDF("id")
    val star = DupClusters.componentsStar(edges, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = DupClusters.components(edges, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    star shouldBe prop
    star(9L) shouldBe 9L // singleton keeps itself
  }

  test("big-star/small-star handles an empty edge set (all singletons)") {
    val edges = Seq.empty[(Long, Long)].toDF("s", "t")
    val nodes = Seq(3L, 4L).toDF("id")
    val labels = DupClusters.componentsStar(edges, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels shouldBe Map(3L -> 3L, 4L -> 4L)
  }

  test("LSH edge generation has no cartesian product in its plan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" < 100)
    val (pairs, caches, _) = Dedup.lshNearDupPairsLazy(docs, "text", "doc_id",
      1, 24, 3, 0.9)
    val plan = pairs.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    caches.foreach(_.unpersist())
  }

  test("LSH edges feed connected components end-to-end") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" < 100)
    val edges = Dedup.lshNearDupPairs(docs, "text", "doc_id")
      .select($"id_a".as("s"), $"id_b".as("t"))
    val reps = DupClusters.clusters(edges, docs.select($"doc_id".as("id")))
      .collect()
    // every representative must be the min id of its cluster, so no
    // cluster member may appear as another cluster's representative
    val labels = DupClusters.components(
      edges, docs.select($"doc_id".as("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    reps.foreach { r => labels(r.getLong(0)) shouldBe r.getLong(0) }
  }

  // count rdd-* checkpoint dirs under a Reliable(dir) root (layout:
  // dir/<session-uuid>/rdd-<id>)
  private def rddCheckpointDirs(root: java.io.File): Seq[java.io.File] =
    Option(root.listFiles()).toSeq.flatten
      .flatMap(u => Option(u.listFiles()).toSeq.flatten)
      .filter(_.getName.startsWith("rdd-"))

  test("Reliable checkpoint mode: componentsStar survives, matches Local, frees superseded rounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_star").toFile
    try {
      val edges = (1 until 51).map(i => (i.toLong, i.toLong + 1)).toDF("s", "t")
      val nodes = (1 to 51).map(_.toLong).toDF("id")
      val reliable = DupClusters.componentsStar(edges, nodes, maxIter = 12,
          mode = CheckpointMode.Reliable(dir.getAbsolutePath))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      val local = DupClusters.componentsStar(edges, nodes, maxIter = 12)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      reliable shouldBe local
      // superseded rounds' files deleted: only the final (returned)
      // round's checkpoint remains on disk
      rddCheckpointDirs(dir).size shouldBe 1
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("Reliable checkpoint mode: min-label components matches Local and frees rounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_ml").toFile
    try {
      val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("s", "t")
      val nodes = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("id")
      val labels = DupClusters.components(edges, nodes,
          mode = CheckpointMode.Reliable(dir.getAbsolutePath))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      labels shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L)
      rddCheckpointDirs(dir).size shouldBe 1
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  // ---- incremental components -------------------------------------

  test("incrementalComponents equals a full recompute over the union graph") {
    import spark.implicits._
    // old graph: {1,2,3} and {10,11} and singleton {20}; new nodes
    // 30,31; new edges merge {10,11} with {1,2,3} via (3,10), attach
    // 30 to {10,11}, and pair (31 alone stays singleton via no edge)
    val oldEdges = Seq((1L,2L),(2L,3L),(10L,11L)).toDF("s","t")
    val oldNodes = Seq(1L,2L,3L,10L,11L,20L).toDF("id")
    val prev = DupClusters.componentsStar(oldEdges, oldNodes)
    val newNodes = Seq(30L,31L).toDF("id")
    val newEdges = Seq((3L,10L),(11L,30L)).toDF("s","t")
    val inc = DupClusters.incrementalComponents(prev, newNodes, newEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = DupClusters.componentsStar(
        oldEdges.union(newEdges),
        oldNodes.union(newNodes))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    inc shouldBe full
    // the merge actually happened: the swallowed component's members
    // carry the merged min label, the singletons keep themselves
    inc(11L) shouldBe 1L
    inc(30L) shouldBe 1L
    inc(20L) shouldBe 20L
    inc(31L) shouldBe 31L
  }

  test("remap plan: corpus labeling never shuffles under the guard; fallback fires above it") {
    // q113's scale contract, pinned executably (the LshIndexSpec:161
    // discipline): the remap's whole claim is that the corpus-sized
    // prevLabels frame flows map-side against a BROADCAST roots map.
    // AQE off + auto-broadcast -1 so only the explicit size-guarded
    // hints can produce a broadcast — then below the guard the remap
    // must carry ONLY BroadcastHashJoins and zero shuffles, and above
    // it (threshold forced to 0) the silent degradation to a shuffle
    // join must actually fire: correct, just no longer shuffle-free.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import spark.implicits._
    val oldEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("s", "t")
    val oldNodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
    val prev = DupClusters.componentsStar(oldEdges, oldNodes)
    val newNodes = Seq(30L).toDF("id")
    val newEdges = Seq((3L, 10L), (11L, 30L)).toDF("s", "t")
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      def planOf(maxKeys: Long) = {
        val (remap, caches) = DupClusters.incrementalComponentsLazy(
          prev, newNodes, newEdges, 50, CheckpointMode.Local, maxKeys)
        try {
          val rows = remap.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
          (remap.queryExecution.executedPlan, rows)
        } finally caches.foreach(_.unpersist())
      }
      val (below, rowsBelow) = planOf(LshSkew.MaxBroadcastKeys)
      withClue("below the guard the remap must be exchange-free: ") {
        below.collect { case e: ShuffleExchangeExec => e } shouldBe empty
      }
      // exactly the two remap joins (old labeling + new nodes)
      below.collect { case j: BroadcastHashJoinExec => j }.size shouldBe 2
      val (above, rowsAbove) = planOf(0L)
      withClue("above the guard the shuffle fallback must fire: ") {
        above.collect { case e: ShuffleExchangeExec => e } should not be empty
      }
      above.collect { case j: BroadcastHashJoinExec => j } shouldBe empty
      // both regimes compute the same labeling — the guard only moves
      // the plan, never the answer
      rowsAbove shouldBe rowsBelow
      rowsBelow(11L) shouldBe 1L // the merge is in the checked output
    }
  }

  // ---- removal face -------------------------------------------------

  test("removeFromLabeling: splits, re-elects gone reps, dissolves, passes untouched through") {
    import spark.implicits._
    // components: {1,2,3,4} chain (2 is a cut vertex), {10,11,12} star
    // centered on its min-id rep 10, {20,21} (20 is the rep), {30}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (20L, 21L)).toDF("s", "t")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L, 30L).toDF("id")
    val prev = DupClusters.componentsStar(edges, nodes)
    // 2 SPLITS its chain, 10 (the rep AND hub) dissolves its star into
    // singletons, 20 is a removed rep with one survivor, 99 was never
    // labeled (idempotence: must touch nothing)
    val removed = Seq(2L, 10L, 20L, 99L).toDF("id")
    def induced(ids: org.apache.spark.sql.DataFrame) = edges
      .join(ids.select(col("id").as("s")), Seq("s"), "left_semi")
      .join(ids.select(col("id").as("t")), Seq("t"), "left_semi")
    val out = DupClusters.removeFromLabeling(prev, removed, induced)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // ground truth: full CC over the survivor-induced graph
    val survivors = nodes.join(removed, Seq("id"), "left_anti")
    val full = DupClusters.componentsStar(induced(survivors), survivors)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    out shouldBe full
    // both re-election regimes agree: the default driver union-find
    // fast path above, the distributed componentsStar fallback forced
    // here (localCcMaxEdges = 0) — the guard moves the plan, never
    // the answer
    DupClusters.removeFromLabeling(prev, removed, induced,
        localCcMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap shouldBe full
    out.keySet should contain noneOf (2L, 10L, 20L, 99L)
    out(1L) shouldBe 1L
    out(3L) shouldBe 3L // the split's right half re-elected
    out(4L) shouldBe 3L
    out(11L) shouldBe 11L // dissolved into singletons
    out(12L) shouldBe 12L
    out(21L) shouldBe 21L // survivor of a removed rep
    out(30L) shouldBe 30L // untouched passthrough
  }

  test("removeFromLabeling via the index survivor view; batch folds in after (q114 dataflow)") {
    // the full takedown × labeling composition at spec scale:
    // labeling over the corpus pair graph → remove a slice from the
    // INDEX and the LABELING (survivor edges re-paired through
    // LshIndex.pairsAmong — no text) → fold a batch in → must equal
    // the full recompute over (corpus ∖ removed) ∪ batch
    val docs = graft.Tables(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") < 60)
    val batch = docs.filter(col("doc_id") >= 60 && col("doc_id") < 80)
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      Dedup.lshNearDupPairs(df, "text", "doc_id",
          shingleWidth = 1, numHashes = 8, numBands = 2, threshold = 0.5)
        .select(col("id_a").as("s"), col("id_b").as("t"))
    val prev = DupClusters.componentsStar(pairsOf(corpus),
      corpus.select(col("doc_id").as("id")))
    val root = java.nio.file.Files.createTempDirectory("graft_remlab_").toString
    try {
      LshIndex.build(spark, s"$root/idx", corpus, "text", "doc_id",
        shingleWidth = 1, numHashes = 8, numBands = 2)
      val removed = docs.filter(col("doc_id") >= 10 && col("doc_id") < 20)
        .select("doc_id")
      LshIndex.remove(spark, s"$root/idx", removed)
      val idx = LshIndex.load(spark, s"$root/idx")
      val pruned = DupClusters.removeFromLabeling(prev, removed, ids => {
        val (p, c) = LshIndex.pairsAmong(idx, ids, threshold = 0.5)
        c.anyDropped shouldBe false
        p.select(col("id_a").as("s"), col("id_b").as("t"))
      })
      // the pruned labeling alone equals a full survivor recompute
      val survCorpus = docs.filter(col("doc_id") < 60)
        .join(removed, Seq("doc_id"), "left_anti")
      val prunedMap = pruned.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val survFull = DupClusters.componentsStar(pairsOf(survCorpus),
          survCorpus.select(col("doc_id").as("id")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      prunedMap shouldBe survFull
      // and the NEXT batch folds into the pruned labeling exactly
      val (bp, census) = LshIndex.incrementalPairs(idx, batch, "text",
        threshold = 0.5)
      census.anyDropped shouldBe false
      val inc = DupClusters.incrementalComponents(pruned,
          batch.select(col("doc_id").as("id")),
          bp.select(col("id_a").as("s"), col("id_b").as("t")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val union = survCorpus.select("doc_id", "text")
        .unionByName(batch.select("doc_id", "text"))
      val full = DupClusters.componentsStar(pairsOf(union),
          union.select(col("doc_id").as("id")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      full should not be empty
      inc shouldBe full
    } finally {
      val pp = new org.apache.hadoop.fs.Path(root)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    }
  }

  test("incrementalComponents on the real near-dup graph: batch pairs fold in exactly") {
    // the q113 dataflow at spec scale: prior labels over the corpus
    // pair graph, batch-touching pairs from the INCREMENTAL LSH path,
    // quotient fold-in == full CC over the union pair graph
    val docs = graft.Tables(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") < 40)
    val batch = docs.filter(col("doc_id") >= 40 && col("doc_id") < 60)
    val union = docs.filter(col("doc_id") < 60)
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      Dedup.lshNearDupPairs(df, "text", "doc_id",
          shingleWidth = 1, numHashes = 8, numBands = 2, threshold = 0.5)
        .select(col("id_a").as("s"), col("id_b").as("t"))
    val prev = DupClusters.componentsStar(pairsOf(corpus),
      corpus.select(col("doc_id").as("id")))
    val root = java.nio.file.Files.createTempDirectory("graft_incc_").toString
    try {
      LshIndex.build(spark, s"$root/idx", corpus, "text", "doc_id",
        shingleWidth = 1, numHashes = 8, numBands = 2)
      val (bp, census) = LshIndex.incrementalPairs(
        LshIndex.load(spark, s"$root/idx"), batch, "text", threshold = 0.5)
      census.anyDropped shouldBe false
      val inc = DupClusters.incrementalComponents(prev,
          batch.select(col("doc_id").as("id")),
          bp.select(col("id_a").as("s"), col("id_b").as("t")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val full = DupClusters.componentsStar(pairsOf(union),
          union.select(col("doc_id").as("id")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      full should not be empty
      inc shouldBe full
    } finally {
      val pp = new org.apache.hadoop.fs.Path(root)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    }
  }
}
