package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Persisted labeling store: every mutation face vs a from-scratch
  * recompute over the survivor graph, the delta-composition edge
  * cases (merge → split-restore → colliding fold), tombstone
  * terminality, compact parity, and marker identity.
  */
class LabelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_labelstore_").toString

  /** Ground truth: exact CC over the alive survivor graph. */
  private def truth(nodes: Set[Long], edges: Seq[(Long, Long)])
      : Map[Long, Long] = {
    val alive = edges.filter(e => nodes(e._1) && nodes(e._2))
    DupClusters.componentsStar(alive.toDF("s", "t"),
        nodes.toSeq.toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def loaded(path: String): Map[Long, Long] =
    LabelStore.load(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** survivorEdges callback matching its contract: pairs among the
    * given ids under the current corpus = the truth edge list
    * restricted to both endpoints in the set.
    */
  private def survivorsFrom(edges: Seq[(Long, Long)])
      : DataFrame => DataFrame = ids => {
    val keep = ids.collect().map(_.getLong(0)).toSet
    edges.filter(e => keep(e._1) && keep(e._2)).toDF("s", "t")
  }

  test("create + load round-trips; create refuses an existing store") {
    val p = s"${tmp()}/store"
    val labels = Seq((1L, 1L), (2L, 1L), (5L, 5L)).toDF("id", "label")
    LabelStore.create(spark, p, labels)
    loaded(p) shouldBe Map(1L -> 1L, 2L -> 1L, 5L -> 5L)
    LabelStore.opSeq(spark, p) shouldBe 0L
    intercept[IllegalArgumentException] {
      LabelStore.create(spark, p, labels)
    }.getMessage should include("already exists")
  }

  test("foldBatch persists incrementalComponents' exact result") {
    val p = s"${tmp()}/store"
    val nodes0 = Set(1L, 2L, 3L, 10L, 11L, 20L)
    val edges0 = Seq((1L, 2L), (10L, 11L))
    LabelStore.create(spark, p,
      truth(nodes0, edges0).toSeq.toDF("id", "label"))
    // batch: new nodes 30,31; edges merge {1,2} with {10,11} (old-old),
    // attach 30 to 3 (old-new), 31 singleton
    val batchNodes = Seq(30L, 31L).toDF("id")
    val batchEdges = Seq((2L, 10L), (3L, 30L)).toDF("s", "t")
    LabelStore.foldBatch(spark, p, batchNodes, batchEdges)
    val allNodes = nodes0 ++ Set(30L, 31L)
    val allEdges = edges0 ++ Seq((2L, 10L), (3L, 30L))
    loaded(p) shouldBe truth(allNodes, allEdges)
    LabelStore.opSeq(spark, p) shouldBe 1L
  }

  test("remove persists removeFromLabeling's exact result (incl. splits)") {
    val p = s"${tmp()}/store"
    // chain 1-2-3: removing 2 SPLITS the component; {5,6} untouched
    val nodes = Set(1L, 2L, 3L, 5L, 6L)
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L))
    LabelStore.create(spark, p, truth(nodes, edges).toSeq.toDF("id", "label"))
    LabelStore.remove(spark, p, Seq(2L).toDF("id"), survivorsFrom(edges))
    loaded(p) shouldBe truth(nodes - 2L, edges)
    loaded(p) shouldBe Map(1L -> 1L, 3L -> 3L, 5L -> 5L, 6L -> 5L)
  }

  test("removing a cluster's min-id representative re-elects, never dangles") {
    val p = s"${tmp()}/store"
    val nodes = Set(1L, 2L, 3L)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)) // triangle, rep 1
    LabelStore.create(spark, p, truth(nodes, edges).toSeq.toDF("id", "label"))
    LabelStore.remove(spark, p, Seq(1L).toDF("id"), survivorsFrom(edges))
    loaded(p) shouldBe Map(2L -> 2L, 3L -> 2L) // rep re-elected to 2
  }

  test("collision cycle: a label remapped away, override-restored, then " +
      "re-used by a fold still reads exactly") {
    val p = s"${tmp()}/store"
    // comp {2,3} label 2, comp {1,9} label 1
    val edges0 = Seq((2L, 3L), (1L, 9L))
    var nodes = Set(1L, 2L, 3L, 9L)
    var edges = edges0
    LabelStore.create(spark, p, truth(nodes, edges).toSeq.toDF("id", "label"))
    // fold 1: edge (1,2) merges comp 2 into comp 1 ⇒ remap 2→1
    edges = edges :+ (1L, 2L)
    LabelStore.foldBatch(spark, p, spark.emptyDataset[Long].toDF("id"),
      Seq((1L, 2L)).toDF("s", "t"))
    loaded(p) shouldBe truth(nodes, edges)
    // remove 1 and 9: comp {1,2,3,9} splits to {2,3} — label 2 is
    // RESTORED via overrides
    nodes = nodes -- Set(1L, 9L)
    LabelStore.remove(spark, p, Seq(1L, 9L).toDF("id"), survivorsFrom(edges))
    loaded(p) shouldBe truth(nodes, edges)
    loaded(p) shouldBe Map(2L -> 2L, 3L -> 2L)
    // fold 2: new nodes 5,6 joining comp 2... new comp min is 2, a
    // label that was ONCE remapped away — the collision rule must
    // route these to overrides, or the stale 2→1 base remap would
    // misapply to them
    nodes = nodes ++ Set(5L, 6L)
    edges = edges ++ Seq((2L, 5L), (5L, 6L))
    LabelStore.foldBatch(spark, p, Seq(5L, 6L).toDF("id"),
      Seq((2L, 5L), (5L, 6L)).toDF("s", "t"))
    loaded(p) shouldBe truth(nodes, edges)
    loaded(p) shouldBe Map(2L -> 2L, 3L -> 2L, 5L -> 2L, 6L -> 2L)
  }

  test("tombstones are terminal until compact") {
    val p = s"${tmp()}/store"
    val edges = Seq((1L, 2L))
    LabelStore.create(spark, p,
      truth(Set(1L, 2L, 3L), edges).toSeq.toDF("id", "label"))
    LabelStore.remove(spark, p, Seq(3L).toDF("id"), survivorsFrom(edges))
    // re-inserting the tombstoned id is a hard error
    intercept[IllegalArgumentException] {
      LabelStore.foldBatch(spark, p, Seq(3L).toDF("id"),
        spark.emptyDataset[(Long, Long)].toDF("s", "t"))
    }.getMessage should include("tombstoned")
    // an edge touching it too
    intercept[IllegalArgumentException] {
      LabelStore.foldBatch(spark, p, Seq(7L).toDF("id"),
        Seq((3L, 7L)).toDF("s", "t"))
    }.getMessage should include("tombstoned")
    // compact clears the log — the id is a fresh identity again
    LabelStore.compact(spark, p)
    LabelStore.foldBatch(spark, p, Seq(3L).toDF("id"),
      Seq((1L, 3L)).toDF("s", "t"))
    loaded(p) shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("compact preserves the labeling and the marker, clears the log") {
    val p = s"${tmp()}/store"
    var nodes = Set(1L, 2L, 3L, 4L)
    var edges = Seq((1L, 2L), (3L, 4L))
    LabelStore.create(spark, p, truth(nodes, edges).toSeq.toDF("id", "label"))
    LabelStore.foldBatch(spark, p, Seq(8L).toDF("id"),
      Seq((2L, 3L), (4L, 8L)).toDF("s", "t"), batchMarker = Some(7L))
    nodes += 8L; edges = edges ++ Seq((2L, 3L), (4L, 8L))
    LabelStore.remove(spark, p, Seq(1L).toDF("id"), survivorsFrom(edges))
    nodes -= 1L
    val before = loaded(p)
    before shouldBe truth(nodes, edges)
    LabelStore.compact(spark, p)
    loaded(p) shouldBe before
    LabelStore.appendedThrough(spark, p) shouldBe 7L
    // the delta log is gone; a fresh fold still works
    val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(s"$p/deltas.parquet")) shouldBe false
    LabelStore.foldBatch(spark, p, Seq(9L).toDF("id"),
      Seq((8L, 9L)).toDF("s", "t"))
    nodes += 9L; edges = edges :+ (8L, 9L)
    loaded(p) shouldBe truth(nodes, edges)
  }

  test("marked folds are exactly-once per identity; a foreign marker refuses") {
    val p = s"${tmp()}/store"
    LabelStore.create(spark, p, Seq((1L, 1L)).toDF("id", "label"))
    LabelStore.foldBatch(spark, p, Seq(2L).toDF("id"),
      Seq((1L, 2L)).toDF("s", "t"), batchMarker = Some(0L))
    LabelStore.appendedThrough(spark, p) shouldBe 0L
    // marker is monotonic: folding batch 5 then 3 never regresses
    LabelStore.foldBatch(spark, p, Seq(3L).toDF("id"),
      spark.emptyDataset[(Long, Long)].toDF("s", "t"), batchMarker = Some(5L))
    LabelStore.foldBatch(spark, p, Seq(4L).toDF("id"),
      spark.emptyDataset[(Long, Long)].toDF("s", "t"), batchMarker = Some(3L))
    LabelStore.appendedThrough(spark, p) shouldBe 5L
    // a different writer identity is a hard error
    intercept[IllegalArgumentException] {
      LabelStore.foldBatchAs(spark, p, Seq(9L).toDF("id"),
        spark.emptyDataset[(Long, Long)].toDF("s", "t"), 50,
        CheckpointMode.Local, Some(6L), writer = "some-query-uuid")
    }.getMessage should include("different writers")
  }

  test("read plan: one base scan, zero shuffles, delta maps ride explicit broadcasts") {
    // the class-doc scale claim pinned as a plan shape (the
    // LshIndexSpec discipline): reads are corpus-sized because the
    // ANSWER is corpus-sized, but the labeling itself must never
    // re-shuffle between compactions. AQE off + auto-broadcast -1 so
    // only the code's explicit hints can produce a broadcast.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val p = s"${tmp()}/store"
    var nodes = (0L until 20L).toSet
    var edges = Seq((1L, 2L), (3L, 4L), (5L, 6L))
    LabelStore.create(spark, p, truth(nodes, edges).toSeq.toDF("id", "label"))
    // leave all three delta kinds live: a fold that merges two old
    // components (remap), a remove (tombstones + overrides)
    LabelStore.foldBatch(spark, p, Seq(50L).toDF("id"),
      Seq((50L, 2L), (50L, 4L)).toDF("s", "t"))
    nodes += 50L; edges = edges ++ Seq((50L, 2L), (50L, 4L))
    LabelStore.remove(spark, p, Seq(5L).toDF("id"), survivorsFrom(edges))
    nodes -= 5L
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = LabelStore.load(spark, p)
      val plan = df.queryExecution.executedPlan
      plan.collect {
        case s: FileSourceScanExec
            if s.relation.location.rootPaths.exists(
              _.toString.contains("labels.parquet")) => ()
      }.size shouldBe 1
      withClue("the labeling must not shuffle between compactions: ") {
        plan.collect { case e: ShuffleExchangeExec => e } shouldBe empty
      }
      // tombstones + overrides share one id-keyed broadcast; the
      // remap is the second — at most two probes per corpus row
      plan.collect { case e: BroadcastExchangeExec => e }.size shouldBe 2
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
        truth(nodes, edges)
    }
  }

  test("remove reports its override mass; compactIfOverMass bounds the " +
      "post-takedown read price") {
    val deltasOf: String => org.apache.hadoop.fs.Path =
      p => new org.apache.hadoop.fs.Path(s"$p/deltas.parquet")
    val fs = new org.apache.hadoop.fs.Path("/tmp").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // triangle {1,2,3} (rep 1), pair {5,6}, singleton 7
    val nodes = Set(1L, 2L, 3L, 5L, 6L, 7L)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L))
    // sub-threshold takedown: mass reported, gate does NOT fire —
    // removing the singleton touches no component (0 overrides)
    val p1 = s"${tmp()}/store"
    LabelStore.create(spark, p1, truth(nodes, edges).toSeq.toDF("id", "label"))
    val m1 = LabelStore.remove(spark, p1, Seq(7L).toDF("id"),
      survivorsFrom(edges), compactIfOverMass = 1L)
    m1 shouldBe LabelStore.RemovalMass(1L, 0L, 1L, compacted = false)
    fs.exists(deltasOf(p1)) shouldBe true
    // dense takedown: the triangle's rep goes, 2 survivors re-elect →
    // override mass 2 ≥ threshold, compact fires inside the call
    val m2 = LabelStore.remove(spark, p1, Seq(1L).toDF("id"),
      survivorsFrom(edges), compactIfOverMass = 2L)
    m2.tombstones shouldBe 1L
    m2.overrides shouldBe 2L
    m2.compacted shouldBe true
    m2.deltaRowsAfter shouldBe 0L
    fs.exists(deltasOf(p1)) shouldBe false // log folded, read at base price
    loaded(p1) shouldBe truth(nodes - 7L - 1L, edges)
    // same takedown WITHOUT the gate: mass identical, log kept
    val p2 = s"${tmp()}/store"
    LabelStore.create(spark, p2, truth(nodes, edges).toSeq.toDF("id", "label"))
    val m3 = LabelStore.remove(spark, p2, Seq(1L).toDF("id"),
      survivorsFrom(edges))
    m3 shouldBe LabelStore.RemovalMass(1L, 2L, 3L, compacted = false)
    fs.exists(deltasOf(p2)) shouldBe true
    loaded(p2) shouldBe truth(nodes - 1L, edges)
  }

  test("randomized op sequences match the from-scratch recompute") {
    val rnd = new scala.util.Random(20260814L)
    val p = s"${tmp()}/store"
    var nextId = 100L
    var nodes = (0L until 30L).toSet
    var edges = Seq.tabulate(20)(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    LabelStore.create(spark, p, truth(nodes, edges).toSeq.toDF("id", "label"))
    for (op <- 1 to 10) {
      if (op % 3 == 0 && nodes.size > 5) {
        // remove a random slice of alive ids
        val slice = rnd.shuffle(nodes.toSeq).take(1 + rnd.nextInt(4))
        LabelStore.remove(spark, p, slice.toDF("id"), survivorsFrom(edges))
        nodes = nodes -- slice
      } else {
        // fold a batch of new nodes with edges into alive ∪ new
        val fresh = (nextId until nextId + 3L).toSeq
        nextId += 3L
        val pool = (nodes ++ fresh).toSeq
        val newEdges = Seq.tabulate(5)(_ =>
          (fresh(rnd.nextInt(fresh.size)),
            pool(rnd.nextInt(pool.size)))).filter(e => e._1 != e._2) ++
          // occasionally an old-old merge edge
          (if (nodes.size >= 2) {
            val s = rnd.shuffle(nodes.toSeq).take(2)
            Seq((s(0), s(1)))
          } else Nil)
        LabelStore.foldBatch(spark, p, fresh.toDF("id"),
          newEdges.toDF("s", "t"))
        nodes = nodes ++ fresh
        edges = edges ++ newEdges
      }
      withClue(s"after op $op: ") {
        loaded(p) shouldBe truth(nodes, edges)
      }
    }
  }
}
