package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [[ConcurrentWriterSoakSpec]]'s sustained-contention contract,
  * extended to the INDEX artifacts: LshIndex / SrpIndex / IvfIndex
  * share the LabelStore's POSIX-exclusive writer lease, but until
  * this spec nothing raced two live sessions through their
  * append/remove/compact faces for dozens of ops. ONE parameterized
  * soak body; per-index adapters supply create/append/remove/compact/
  * alive. The pinned interleaving contract:
  *
  *  - every attempt COMMITS cleanly or refuses LOUDLY with a
  *    documented contention error (lease held / takeover race lost /
  *    a scan racing a compaction's file swap) — never anything else;
  *  - a refusal leaves no trace, so retrying against fresh state
  *    converges;
  *  - the final served id set equals the serial replay of exactly
  *    the COMMITTED ops: seeds + committed appends − committed
  *    removals (writers own disjoint id regions, so the union of
  *    their bookkeeping IS the serial replay).
  *
  * Removed ids are never re-appended (the documented tombstone
  * contract) — each writer's append ids only move forward.
  */
class IndexConcurrentSoakSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_idx_soak_").toString

  private def docsDF(s: SparkSession, ids: Seq[Long]): DataFrame = {
    import s.implicits._
    ids.map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3} body$i"))
      .toDF("doc_id", "text")
  }

  private def vecsDF(s: SparkSession, ids: Seq[Long]): DataFrame = {
    import s.implicits._
    ids.map(i => (i,
        Seq.tabulate(8)(d => (((i * 31 + d * 7) % 13) - 6).toFloat)))
      .toDF("vec_id", "embedding")
  }

  private def idsDF(s: SparkSession, ids: Seq[Long]): DataFrame = {
    import s.implicits._
    ids.toDF("id")
  }

  private trait IndexOps {
    def name: String
    def create(s: SparkSession, path: String, ids: Seq[Long]): Unit
    def append(s: SparkSession, path: String, ids: Seq[Long]): Unit
    def remove(s: SparkSession, path: String, ids: Seq[Long]): Unit
    def compact(s: SparkSession, path: String): Unit
    def alive(s: SparkSession, path: String): Set[Long]
  }

  private val lshOps: IndexOps = new IndexOps {
    val name = "LshIndex"
    def create(s: SparkSession, path: String, ids: Seq[Long]): Unit =
      LshIndex.build(s, path, docsDF(s, ids), "text", "doc_id",
        shingleWidth = 1, numHashes = 8, numBands = 2)
    def append(s: SparkSession, path: String, ids: Seq[Long]): Unit =
      LshIndex.append(s, path, docsDF(s, ids), "text")
    def remove(s: SparkSession, path: String, ids: Seq[Long]): Unit =
      LshIndex.remove(s, path, idsDF(s, ids))
    def compact(s: SparkSession, path: String): Unit =
      LshIndex.compactFrames(s, path)
    def alive(s: SparkSession, path: String): Set[Long] =
      LshIndex.load(s, path).base.select(col("id"))
        .collect().map(_.getLong(0)).toSet
  }

  private val srpOps: IndexOps = new IndexOps {
    val name = "SrpIndex"
    def create(s: SparkSession, path: String, ids: Seq[Long]): Unit =
      SrpIndex.build(s, path, vecsDF(s, ids),
        numBands = 2, planesPerBand = 4, dims = 8)
    def append(s: SparkSession, path: String, ids: Seq[Long]): Unit =
      SrpIndex.append(s, path, vecsDF(s, ids))
    def remove(s: SparkSession, path: String, ids: Seq[Long]): Unit =
      SrpIndex.remove(s, path, idsDF(s, ids))
    def compact(s: SparkSession, path: String): Unit =
      SrpIndex.compactFrames(s, path)
    def alive(s: SparkSession, path: String): Set[Long] =
      SrpIndex.load(s, path).base.select(col("id"))
        .collect().map(_.getLong(0)).toSet
  }

  private val ivfOps: IndexOps = new IndexOps {
    val name = "IvfIndex"
    def create(s: SparkSession, path: String, ids: Seq[Long]): Unit = {
      val corpus = vecsDF(s, ids)
      val centroids = vecsDF(s, ids.take(4))
      IvfIndex.save(s, path, centroids,
        Some(Similarity.assignToCentroids(corpus, centroids)))
    }
    def append(s: SparkSession, path: String, ids: Seq[Long]): Unit =
      IvfIndex.append(s, path, vecsDF(s, ids))
    def remove(s: SparkSession, path: String, ids: Seq[Long]): Unit =
      IvfIndex.remove(s, path, idsDF(s, ids))
    def compact(s: SparkSession, path: String): Unit =
      IvfIndex.compactAssignments(s, path)
    def alive(s: SparkSession, path: String): Set[Long] =
      IvfIndex.load(s, path).assignments.get.select(col("vec_id"))
        .collect().map(_.getLong(0)).toSet
  }

  /** The documented contention refusals — anything else fails the
    * soak. Lease refusals and takeover races come from
    * IndexFiles.withWriterLease; FAILED_READ_FILE / does-not-exist
    * cover a reader planning over files a concurrent compaction
    * swapped (re-plan from fresh state).
    */
  private def isContractRefusal(e: Throwable): Boolean = {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val all = msgs(e).mkString(" | ")
    all.contains("_writer_lock") || all.contains("lost the takeover race") ||
      all.contains("FAILED_READ_FILE") || all.contains("does not exist")
  }

  private final class Writer(ops: IndexOps, session: SparkSession,
                             path: String, seed: Long, base: Long, nOps: Int,
                             bad: java.util.concurrent.ConcurrentLinkedQueue[String])
    extends Runnable {
    val rnd = new scala.util.Random(seed)
    var alive: Set[Long] = (base until base + 10L).toSet
    var nextId: Long = base + 100L
    var commits = 0
    var retries = 0
    // index ops run real Spark jobs per attempt, so the lease can be
    // held much longer than LabelStore's — a wider attempt budget
    // turns only a genuine livelock into the loud failure below
    val maxAttempts = 64

    override def run(): Unit = {
      for (op <- 1 to nOps) {
        val kind =
          if (op % 8 == 0) "compact"
          else if (op % 4 == 0 && alive.size > 6) "remove"
          else "append"
        val removeSlice =
          if (kind == "remove") rnd.shuffle(alive.toSeq).take(1 + rnd.nextInt(2))
          else Nil
        val fresh =
          if (kind == "append") (nextId until nextId + 3L).toSeq else Nil
        var attempt = 0
        var committed = false
        while (!committed && attempt < maxAttempts) {
          attempt += 1
          try {
            kind match {
              case "compact" => ops.compact(session, path)
              case "remove"  => ops.remove(session, path, removeSlice)
              case _         => ops.append(session, path, fresh)
            }
            committed = true
            commits += 1
            kind match {
              case "compact" => ()
              case "remove"  => alive = alive -- removeSlice
              case _         => alive = alive ++ fresh
            }
          } catch {
            case e: Throwable if isContractRefusal(e) =>
              retries += 1
              Thread.sleep(rnd.nextInt(40 * attempt).toLong)
            case e: Throwable =>
              bad.add(s"${ops.name} op $op ($kind) attempt $attempt: " +
                s"${e.getClass.getName}: ${e.getMessage}")
              return
          }
        }
        if (!committed)
          bad.add(s"${ops.name} op $op ($kind): exhausted $maxAttempts " +
            "attempts without a commit (livelock)")
        if (kind == "append") nextId += 3L // ids burn, committed or not
      }
    }
  }

  Seq(lshOps, srpOps, ivfOps).foreach { ops =>
    test(s"${ops.name}: two sessions racing append/remove/compact — " +
         "commit-or-refuse-loudly; final ids == serial replay") {
      val p = s"${tmp()}/idx"
      ops.create(spark, p, ((1000L until 1010L) ++ (5000L until 5010L)).toSeq)

      val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val w1 = new Writer(ops, spark.newSession(), p, 1801L, 1000L, 16, bad)
      val w2 = new Writer(ops, spark.newSession(), p, 1802L, 5000L, 16, bad)
      val t1 = new Thread(w1, s"idx-soak-${ops.name}-1")
      val t2 = new Thread(w2, s"idx-soak-${ops.name}-2")
      t1.start(); t2.start()
      t1.join(15 * 60 * 1000L); t2.join(15 * 60 * 1000L)
      t1.isAlive shouldBe false
      t2.isAlive shouldBe false

      withClue(s"non-contract failures: ${bad.toArray.mkString("; ")}\n") {
        bad.isEmpty shouldBe true
      }
      (w1.commits + w2.commits) shouldBe 32
      withClue("soak saw zero lease contention — not a soak: ") {
        (w1.retries + w2.retries) should be > 0
      }

      ops.alive(spark, p) shouldBe (w1.alive ++ w2.alive)
      info(s"${ops.name} soak: commits=${w1.commits + w2.commits} " +
        s"refused-and-retried=${w1.retries + w2.retries}")
    }
  }
}
