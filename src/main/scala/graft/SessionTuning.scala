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
  *  - `optimizer.canChangeCachedPlanOutputPartitioning=true` (r22,
  *    guide §2.2): apply AQE (partition coalescing included) to the
  *    plans that materialize `persist()`ed frames. The upstream
  *    default is `false` only to keep a cached plan's output
  *    partitioning bit-stable for downstream exchange reuse — a
  *    compatibility stance, not a performance one; with it off every
  *    cached materialization runs at the raw `shuffle.partitions`
  *    fan-out and EVERY downstream read of the cache re-scans that
  *    many tiny blocks. The engine's iterative operators (CC rounds,
  *    index removals, label folds) persist bounded frames by design,
  *    so at 100 TB this is the same advisory-sized-reduce-partition
  *    argument as `parallelismFirst=false`, applied to the cached
  *    stages. Measured (same-process ABA, lifecycle family + CC
  *    gates, sf0.1/32 cpus): 124.3/107.3 s baseline arms → 93.2 s
  *    with the flag (−19% vs the better baseline arm); event-log
  *    profile shows the 32-task cached stages (20+ per removal gate)
  *    collapse to 1–2 tasks.
  *  - `codegen.cache.maxEntries=5000` (r22, static conf): the
  *    generated-class cache default (100) thrashes under an engine
  *    that plans hundreds of distinct operator shapes per session —
  *    every eviction is a repeat Janino compile on the driver, which
  *    is exactly the r21 profile's "driver-side gap" bucket. 5000
  *    compiled classes is a few hundred MB of metaspace at worst,
  *    amortized across every micro-batch/round that replans the same
  *    shape — strictly cheaper at any scale. Measured on top of the
  *    cached-plan flag: 93.2 → 82.4 s on the same family (−12%).
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
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        env("SPARK_GRAFT_CACHED_PLAN_AQE", "true"))
      .config("spark.sql.codegen.cache.maxEntries",
        env("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
  }
}
