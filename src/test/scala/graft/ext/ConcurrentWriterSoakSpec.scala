package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Concurrent-writer soak for the persisted-store family: TWO live
  * SparkSessions racing fold/remove/compact against ONE LabelStore
  * for dozens of committed ops (a hundred-plus attempts), no
  * coordination beyond the store's own writer lease. The pairwise
  * lease/marker semantics are IndexGuardSpec's; what only a soak can
  * pin is the INTERLEAVING contract under sustained contention:
  *
  *  - every attempt either COMMITS cleanly or fails LOUDLY with one
  *    of the two documented refusals (lease held / optimistic opSeq
  *    staleness — the compute ran against a labeling a concurrent
  *    writer advanced), never any other error;
  *  - a failed attempt leaves NO trace (both refusals fire before the
  *    meta-delete that opens the swap window), so retrying against
  *    fresh state is always safe — the documented "re-run the fold"
  *    recovery, which this soak drives for real;
  *  - the final labeling equals the from-scratch recompute over
  *    exactly the COMMITTED ops' survivor graph — no lost update, no
  *    torn delta, no half-applied tombstone ever surfaces.
  *
  * The two writers mutate DISJOINT id regions with no cross-region
  * edges, so the committed-ops ground truth is order-independent
  * (CC over the union graph) while the STORE-level interleavings —
  * meta swaps, delta appends, compactions — contend on every op.
  */
class ConcurrentWriterSoakSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cw_soak_").toString

  /** One writer's thread body: `ops` randomized fold/remove/compact
    * ops over its own id region, each attempted up to `maxAttempts`
    * times against fresh state (bookkeeping updates ONLY on commit).
    * Returns (aliveNodes, aliveEdges, commits, retries) and collects
    * any NON-contract failure message.
    */
  private final class Writer(session: SparkSession, path: String,
                             seed: Long, base: Long, ops: Int,
                             bad: java.util.concurrent.ConcurrentLinkedQueue[String])
    extends Runnable {
    val rnd = new scala.util.Random(seed)
    // bookkeeping starts EXACTLY at the created store's state: the
    // seed ids as singletons, no edges (connectivity arrives only
    // through committed folds, so truth == serial replay by
    // construction)
    var nodes: Set[Long] = (base until base + 10L).toSet
    var edges: Seq[(Long, Long)] = Nil
    var nextId: Long = base + 100L
    var commits = 0
    var retries = 0
    // high cap + jittered backoff: convergence of retry-on-refusal is
    // probabilistic, and under a loaded box (the full suite runs
    // around this spec) each op's lease window stretches — two
    // writers retrying in lockstep with only 8 attempts and no
    // backoff flaked once under full-suite load without any contract
    // violation. The backoff de-synchronizes them; the cap exists
    // only to turn a genuine livelock into a loud failure.
    val maxAttempts = 32

    private def df2(rows: Seq[(Long, Long)], c1: String, c2: String): DataFrame =
      session.createDataFrame(rows).toDF(c1, c2)
    private def df1(rows: Seq[Long], c: String): DataFrame =
      session.createDataFrame(rows.map(Tuple1(_))).toDF(c)

    private def survivors(ids: DataFrame): DataFrame = {
      val keep = ids.collect().map(_.getLong(0)).toSet
      df2(edges.filter(e => keep(e._1) && keep(e._2)), "s", "t")
    }

    /** The contract's three loud refusals — anything else is a soak
      * failure: lease held, optimistic opSeq staleness, and a compute
      * scan racing a concurrent compact's in-place base/delta swap
      * (FAILED_READ_FILE — the files it planned over were replaced;
      * no trace left, re-plan from fresh state).
      */
    private def isContractRefusal(e: Throwable): Boolean = {
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      val all = msgs(e).mkString(" | ")
      all.contains("_writer_lock") || all.contains("was mutated (opSeq") ||
        all.contains("FAILED_READ_FILE") || all.contains("does not exist")
    }

    override def run(): Unit = {
      for (op <- 1 to ops) {
        // plan the op against current bookkeeping; retry attempts
        // re-run the SAME op against fresh store state
        val kind =
          if (op % 10 == 0) "compact"
          else if (op % 4 == 0 && nodes.size > 6) "remove"
          else "fold"
        val removeSlice =
          if (kind == "remove") rnd.shuffle(nodes.toSeq).take(1 + rnd.nextInt(3))
          else Nil
        val fresh =
          if (kind == "fold") (nextId until nextId + 3L).toSeq else Nil
        val newEdges =
          if (kind == "fold") {
            val pool = (nodes ++ fresh).toSeq
            Seq.tabulate(4)(_ =>
              (fresh(rnd.nextInt(fresh.size)), pool(rnd.nextInt(pool.size))))
              .filter(e => e._1 != e._2)
          } else Nil
        var attempt = 0
        var committed = false
        while (!committed && attempt < maxAttempts) {
          attempt += 1
          try {
            kind match {
              case "compact" => LabelStore.compact(session, path)
              case "remove" =>
                LabelStore.remove(session, path, df1(removeSlice, "id"),
                  survivors)
              case _ =>
                LabelStore.foldBatch(session, path, df1(fresh, "id"),
                  df2(newEdges, "s", "t"))
            }
            committed = true
            commits += 1
            kind match {
              case "compact" => ()
              case "remove"  => nodes = nodes -- removeSlice
              case _         => nodes = nodes ++ fresh; edges = edges ++ newEdges
            }
          } catch {
            case e: Throwable if isContractRefusal(e) =>
              retries += 1
              Thread.sleep(rnd.nextInt(40 * attempt).toLong)
            case e: Throwable =>
              bad.add(s"op $op ($kind) attempt $attempt: ${e.getClass.getName}: ${e.getMessage}")
              return
          }
        }
        if (kind == "fold") nextId += 3L // ids burn whether or not committed
      }
    }
  }

  test("two live sessions racing fold/remove/compact: every attempt " +
       "commits or refuses loudly; final state == serial replay of " +
       "the committed ops") {
    val p = s"${tmp()}/store"
    // seed both regions so neither writer's first fold races create
    val init = ((1000L until 1010L) ++ (5000L until 5010L)).toSeq
    LabelStore.create(spark, p,
      init.map(i => (i, i)).toDF("id", "label"))

    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val w1 = new Writer(spark.newSession(), p, 1701L, 1000L, 24, bad)
    val w2 = new Writer(spark.newSession(), p, 1702L, 5000L, 24, bad)
    val t1 = new Thread(w1, "soak-writer-1")
    val t2 = new Thread(w2, "soak-writer-2")
    t1.start(); t2.start()
    t1.join(20 * 60 * 1000L); t2.join(20 * 60 * 1000L)
    t1.isAlive shouldBe false
    t2.isAlive shouldBe false

    // (a) no attempt failed with anything but the two loud refusals
    withClue(s"non-contract failures: ${bad.toArray.mkString("; ")}\n") {
      bad.isEmpty shouldBe true
    }
    // (b) every planned op eventually committed (the retry recovery
    // converges under contention) and contention actually happened —
    // a soak that never contended proved nothing
    (w1.commits + w2.commits) shouldBe 48
    withClue("soak saw zero lease/opSeq contention — not a soak: ") {
      (w1.retries + w2.retries) should be > 0
    }

    // (c) final labeling == from-scratch CC over exactly the
    // committed survivor graph (regions disjoint, so the union of the
    // two writers' bookkeeping IS the serial replay)
    val nodes = w1.nodes ++ w2.nodes
    val alive = (w1.edges ++ w2.edges)
      .filter(e => nodes(e._1) && nodes(e._2))
    val truth = DupClusters.componentsStar(alive.toDF("s", "t"),
        nodes.toSeq.toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = LabelStore.load(spark, p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe truth

    info(s"soak: commits=${w1.commits + w2.commits} " +
      s"refused-and-retried=${w1.retries + w2.retries}")
  }
}
