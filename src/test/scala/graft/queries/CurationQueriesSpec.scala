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
    // toString over the (possibly AQE-wrapped) physical plan — the
    // established ScaleJoinSpec/TopKPerKeySpec pattern: AQE's wrapper
    // node hides children from collect until execution
    val plan = ExtensionQueries.q94UnigramQuality(spark, sf)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    // the top-V vocab must plan as TakeOrdered (per-partition top-V),
    // not a global sort of the vocabulary
    plan should include("TakeOrderedAndProject")
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
