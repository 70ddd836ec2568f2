package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions._

/** Plan-regression harness (round-10 verdict ask #3): the pushdown /
  * broadcast / zero-exchange / salt-partitioning audits that
  * previously lived in per-round human plan reads, pinned as one spec
  * that FAILS ON DRIFT. Each headline query's physical plan is
  * fingerprinted as (shuffle-exchange count, broadcast-exchange
  * count, filter-pushed-scan count); a plan change that adds a
  * shuffle, drops a broadcast hint, or loses scan pushdown breaks the
  * fingerprint even when results stay correct.
  *
  * Counting runs on `queryExecution.executedPlan` with AQE pinned
  * OFF inside the spec's conf window: Exchange operators only exist
  * after physical preparation (`EnsureRequirements`), and under AQE
  * the adaptive wrapper hides the plan tree from `collect`. The
  * non-adaptive executed plan is deterministic at spec scale and
  * available without running the query.
  *
  * The auto-broadcast threshold is pinned to -1 (hint-only) for the
  * non-self-pinning queries: at sf0.001 EVERY table fits under the
  * default threshold, which would vacuously zero the shuffle counts —
  * at 100 TB only the hinted dims broadcast, and the fingerprint must
  * guard THAT shape. q81/q90 pin their own planner conf internally
  * (their gate assertions need it) and are counted as returned.
  */
class PlanRegressionSpec extends SparkSpec {

  private case class Shape(shuffles: Int, broadcasts: Int, pushedScans: Int)

  private def shapeOf(df: DataFrame): Shape = {
    val p = df.queryExecution.executedPlan
    Shape(
      p.collect { case _: ShuffleExchangeExec => () }.size,
      p.collect { case _: BroadcastExchangeExec => () }.size,
      p.collect {
        case s: FileSourceScanExec
            if s.metadata.get("PushedFilters").exists(_ != "[]") => ()
      }.size)
  }

  private def hintOnly[T](body: => T): T =
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")(body)

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  // ---- snapshot table: the asserted plan fingerprints ----------------
  // If a deliberate plan improvement changes one of these, update the
  // row AND say why in the commit message — that is the point.
  private val expected = Map(
    // 1 shuffle = the ORDER BY range partition; the filter battery is
    // fully pushed to the one lineitem scan
    "q2_filter_project" -> Shape(shuffles = 1, broadcasts = 0, pushedScans = 1),
    // 2 broadcasts = exactly the hinted dims (nation, region); 6
    // shuffles = the two un-hinted fact joins (2+2), the agg, the
    // sort; all 5 scans carry pushed IsNotNull join-key filters
    "q5_revenue_by_nation" -> Shape(shuffles = 6, broadcasts = 2, pushedScans = 5),
    // 1 broadcast = the top-V vocab (the corpus token stream never
    // shuffles for scoring); doc_id < 200 pushed to the scan
    "q94_unigram_quality" -> Shape(shuffles = 3, broadcasts = 1, pushedScans = 1),
    // 1 co-locating repartition + the final ORDER BY; O(1)-state scan
    // in between adds no exchange
    "q96_seq_packing" -> Shape(shuffles = 2, broadcasts = 0, pushedScans = 0),
    // 5 selector branches (s5 = the float-keyed record, r12) + the
    // metadata/meta frames: each branch is one scan + one shuffle
    "q102_record_store" -> Shape(shuffles = 9, broadcasts = 0, pushedScans = 8),
    "q103_nested_paths" -> Shape(shuffles = 3, broadcasts = 0, pushedScans = 2),
    // 1 broadcast = the per-host delay frame (politeSlice's hint); 2
    // shuffles = the host exchange feeding the rank window (whose
    // partitioning the per-host aggregate then REUSES — a drift that
    // adds an exchange between window and agg breaks this) + the
    // 7-row ORDER BY
    "q165_polite_frontier" -> Shape(shuffles = 2, broadcasts = 1,
      pushedScans = 0))

  for ((name, want) <- expected.toSeq.sortBy(_._1)) {
    test(s"$name plan fingerprint") {
      hintOnly {
        val got = shapeOf(q(name))
        withClue(s"$name plan drifted (shuffles, broadcasts, pushedScans): ") {
          got shouldBe want
        }
      }
    }
  }

  test("q2 pushdown reaches the lineitem scan (non-empty PushedFilters)") {
    hintOnly {
      val scans = q("q2_filter_project").queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec => s.metadata.getOrElse("PushedFilters", "")
      }
      scans should not be empty
      atLeast(1, scans) should (include("EqualTo") and not be "[]")
    }
  }

  test("q30 LSH candidate plan: zero-drop census skips the guard broadcast, no cartesian") {
    hintOnly {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .filter(col("doc_id") < 60)
      val (pairs, caches, _) = graft.ext.Dedup.lshNearDupPairsLazy(
        docs, "text", "doc_id", 1, 24, 3, 0.9)
      try {
        val got = shapeOf(pairs)
        // 0 broadcasts: this fixture has nothing over the cap, and a
        // zero-drop census SKIPS the guard anti-join entirely (r11) —
        // the broadcast reappears only when buckets actually drop
        // (LshSkewSpec's capped fixtures pin that arm). The big banded
        // frame must never be a broadcast side either way. 0 pushed
        // scans: the signature frames are persisted, so the joins read
        // InMemoryTableScans, not file scans
        withClue("q30 lazy pair plan drifted: ") {
          got shouldBe Shape(shuffles = 5, broadcasts = 0, pushedScans = 0)
        }
        val s = pairs.queryExecution.sparkPlan.toString
        s should not include "CartesianProduct"
        s should not include "BroadcastNestedLoopJoin"
      } finally caches.foreach(_.unpersist())
    }
  }

  test("q47 contraction round costs exactly its documented shuffles") {
    hintOnly {
      import spark.implicits._
      // one big-star round on a checkpointed edge frame — the scaladoc
      // claim is "one groupBy + one join shuffle, both on node id",
      // and the physical count proves the groupBy exchange DOUBLES as
      // the join-side distribution (hash(u) already satisfies the
      // join): sym side 1 + groupBy 1 + round-output distinct 1 = 3.
      // A 4th exchange appearing here means the reuse broke.
      val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "t")
        .localCheckpoint(true)
      val round = graft.ext.DupClusters.largeStar(e)
      withClue("largeStar round plan drifted: ") {
        shapeOf(round) shouldBe Shape(shuffles = 3, broadcasts = 0, pushedScans = 0)
      }
    }
  }

  test("q81 bucketed join: SortMergeJoin subtree stays exchange-free") {
    val df = q("q81_bucketed_join")
    val smjs = df.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    smjs should not be empty
    smjs.foreach { j =>
      j.collect { case e: ShuffleExchangeExec => e } shouldBe empty
    }
  }

  test("q90 salted join: both sides shuffle on the salt, no broadcast") {
    val df = q("q90_salted_skew")
    val p = df.queryExecution.executedPlan
    p.collect { case b: BroadcastExchangeExec => b } shouldBe empty
    // resolve the salt as an attribute, not via toString — the same
    // non-contract the production assert (RelationalQueries q90) avoids
    val saltParts = p.collect {
      case e: ShuffleExchangeExec => e.outputPartitioning
    }.collect {
      case hp: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
          if hp.expressions.exists(_.collectFirst {
            case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
                if a.name == "__salt" => a
          }.isDefined) => hp
    }
    saltParts.size should be >= 2
  }
}
