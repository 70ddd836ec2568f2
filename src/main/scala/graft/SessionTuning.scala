package graft

import org.apache.spark.sql.SparkSession

/** Scale-justified session defaults shared by every runtime entry point
  * (Bench / Verify / dev tools), so the driver's bench, the oracle
  * sweep and dev measurements all run the same engine posture.
  *
  * Each setting is env-parameterised with the production-shaped value
  * as the local default — the optimization-round contract: no constant
  * tuned to local[32], every knob justified at 100 TB
  * (OPTIMIZATION_r21.md §"Session configuration").
  *
  *  - `coalescePartitions.parallelismFirst=false` (guide §2.2): size
  *    post-shuffle partitions by the advisory target instead of
  *    maximising parallelism. At scale this is the documented
  *    recommendation (100 MB–1 GB reduce partitions, quadratically
  *    fewer shuffle blocks); at gate scale it collapses toy shuffles
  *    to one task instead of `spark.sql.shuffle.partitions` (=cpus),
  *    removing pure scheduling overhead (measured: the q109–q117
  *    index-lifecycle family −15% wall).
  *  - `advisoryPartitionSizeInBytes=64m` — Spark's own default, kept
  *    explicit + overridable (`SPARK_GRAFT_ADVISORY_BYTES`) because a
  *    production deployment with bigger executors wants 256m (guide
  *    §9) while the contract bench keeps the stock value.
  *
  * Deliberately NOT set (measured, then rejected this round):
  * `preferSortMergeJoin=false` + a shuffled-hash AQE local-map
  * threshold (guide §3.1) flipped the LSH pair joins SMJ→SHJ at small
  * scale with NO measured local win (everything hot already
  * broadcasts) while defeating the AQE skew split on the
  * degenerate-bucket pair join — SkewJoinSpec's `skew=true` pin went
  * red, i.e. the engine would have traded its skew guard (the 100 TB
  * protection) for nothing. Sort-merge stays the default; broadcast
  * remains the chosen strategy everywhere a side provably fits.
  */
object SessionTuning {

  def tuned(b: SparkSession.Builder): SparkSession.Builder = {
    def env(k: String, dflt: String): String = sys.env.getOrElse(k, dflt)
    b.config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        env("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        env("SPARK_GRAFT_ADVISORY_BYTES", "64m"))
  }
}
