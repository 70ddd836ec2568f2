package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curation-pipeline additions: unigram-frequency quality scoring
  * (q94) and temperature-scaled source mixing weights (q95).
  */
class CurationQueriesSpec extends SparkSpec {

  test("q94 scores every doc with consistent token accounting") {
    val out = ExtensionQueries.q94UnigramQuality(spark, sf)
    val rows = out.collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (nToks, nOov, meanFreq) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      nOov should be <= nToks
      nToks should be > 0L
      // every in-vocab token contributes >= 1 to the freq sum, so the
      // mean over ALL tokens is bounded by the in-vocab fraction —
      // minus the half-ulp of the score's 4-decimal rounding, which
      // can dip an exactly-at-the-bound value below it
      meanFreq should be >= (nToks - nOov).toDouble / nToks - 5e-5
    }
  }

  test("q94 scoring join broadcasts the vocab (corpus never shuffles to score)") {
    // match physical operator node CLASSES, not plan-string fragments
    // (pretty-printed names are not a stable contract across Spark
    // versions — the q90 salt check moved off toString for the same
    // reason). AQE's wrapper hides children from a plain collect, so
    // the walk descends through AdaptiveSparkPlanExec/QueryStageExec.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = ExtensionQueries.q94UnigramQuality(spark, sf)
    df.collect() // finalize any AQE re-planning before reading the plan
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
      case q: QueryStageExec        => q +: nodes(q.plan)
      case n => n +: n.children.flatMap(nodes)
    }
    val all = nodes(df.queryExecution.executedPlan)
    all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]) shouldBe true
    // the top-V vocab must plan as TakeOrdered (per-partition top-V),
    // not a global sort of the vocabulary
    all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.TakeOrderedAndProjectExec]) shouldBe true
  }

  test("q128 bigram scoring: consistent accounting + the same broadcast" +
    " + TakeOrdered plan shape as q94") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = ExtensionQueries.q128BigramQuality(spark, sf)
    val rows = df.collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (nBg, nOov, meanFreq) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      nOov should be <= nBg
      nBg should be > 0L
      meanFreq should be >= (nBg - nOov).toDouble / nBg - 5e-5
    }
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
      case q: QueryStageExec        => q +: nodes(q.plan)
      case n => n +: n.children.flatMap(nodes)
    }
    val all = nodes(df.queryExecution.executedPlan)
    all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]) shouldBe true
    all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.TakeOrderedAndProjectExec]) shouldBe true
  }

  test("q96 packing respects the token budget and keeps packs contiguous") {
    val rows = ExtensionQueries.q96SequencePacking(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.length should be > 0
    // budget: every (shard, pack) sums <= 512 tokens unless it is a
    // single oversized doc (which greedy must give its own pack)
    rows.groupBy(t => (t._1, t._4)).foreach { case ((sh, p), docs) =>
      val total = docs.map(_._3).sum
      withClue(s"shard $sh pack $p: ") {
        assert(total <= 512L || docs.length == 1)
      }
    }
    // contiguity: walking a shard in doc_id order, pack ids start at 0
    // and only ever step by +1 (greedy never reopens an earlier pack)
    rows.groupBy(_._1).foreach { case (sh, docs) =>
      val packs = docs.sortBy(_._2).map(_._4)
      withClue(s"shard $sh: ") {
        packs.head shouldBe 0L
        packs.sliding(2).foreach {
          case Array(a, b) => (b - a) should (be(0L) or be(1L))
          case _ => ()
        }
      }
    }
  }

  test("q97 gate: LSH finds >= 0.9 of the true near-dup pairs") {
    // the banded pipeline's recall vs brute-force exact-Jaccard ground
    // truth on the bounded slice. The theoretical worst case at
    // exactly J=0.9 is 1-(1-0.9^8)^3 ~ 0.81; fixture pairs sit above
    // the threshold so measured recall is 0.94-0.95 on all fixtures
    val r = ExtensionQueries.q97LshRecall(spark, sf).head()
    r.getLong(0) should be > 0L     // ground truth is non-trivial
    r.getLong(1) should be <= r.getLong(0) // found subset of true
    r.getDouble(2) should be >= 0.9
  }

  test("q98 scrub removes every injected PII occurrence") {
    import graft.ext.TextStats
    // redaction must be total: re-counting on the SCRUBBED text finds
    // nothing, and counts on the gated output match the injection plan
    val scrubbed = graft.Tables(spark, sf, "documents")
      .filter(col("doc_id") < 200)
      .select(TextStats.redactPii(concat(col("text"),
        lit(" mail a@b.com host 10.0.0.1 tel 555-123-4567"))).as("t"))
    val (ne, ni, np) = TextStats.piiCounts(col("t"))
    val residue = scrubbed.select((ne + ni + np).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    residue shouldBe 0L
    val out = ExtensionQueries.q98PiiScrub(spark, sf).collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val expEmail = (if (id % 3 != 0) 1 else 0) + (if (id % 7 == 0) 1 else 0)
      r.getInt(1) shouldBe expEmail
      r.getInt(2) shouldBe (if (id % 2 == 0) 1 else 0)
      r.getInt(3) shouldBe (if (id % 5 == 0) 1 else 0)
    }
  }

  test("q100 hash split is stable and roughly 90/5/5 per language") {
    val rows = ExtensionQueries.q100HashSplit(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val total = bySplit.values.sum
    // 90/5/5 buckets: train dominates, val+test share the tail. Wide
    // tolerance — the fixture is small, the property is proportional
    val trainShare = bySplit.getOrElse("train", 0L).toDouble / total
    trainShare should (be >= 0.8 and be <= 0.97)
    bySplit.keySet shouldBe Set("train", "val", "test")
    // determinism: the assignment is a pure function of doc_id, so a
    // re-run returns the identical rollup
    val again = ExtensionQueries.q100HashSplit(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    again.toSeq shouldBe rows.toSeq
  }

  test("q101 snapshot diff partitions the union of both snapshots") {
    val rows = ExtensionQueries.q101SnapshotDiff(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.keySet shouldBe Set("added", "removed", "changed", "unchanged")
    // every doc in either snapshot is classified exactly once: the
    // four classes must sum to |old ∪ new| computed independently
    val docs = graft.Tables(spark, sf, "documents")
    val union = docs.filter(col("doc_id") % 5 =!= 0 || col("doc_id") % 11 =!= 0)
      .count()
    rows.values.sum shouldBe union
  }

  test("q95 temperature weights normalize and flatten the mixture") {
    val rows = ExtensionQueries.q95MixWeights(spark, sf).collect()
    rows.length should be > 1
    val prop = rows.map(_.getDouble(3))
    val alpha = rows.map(_.getDouble(4))
    prop.sum shouldBe 1.0 +- 1e-4
    alpha.sum shouldBe 1.0 +- 1e-4
    // alpha=0.5 upweights small sources and downweights large ones:
    // the biggest source loses mass, the smallest gains
    val byProp = prop.zip(alpha)
    val (maxP, alphaOfMax) = byProp.maxBy(_._1)
    val (minP, alphaOfMin) = byProp.minBy(_._1)
    alphaOfMax should be < maxP
    alphaOfMin should be > minP
  }
}
