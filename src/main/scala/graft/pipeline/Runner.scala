package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Append
import graft.sources.TreeScan
import scala.collection.mutable

/** Pipeline executor — the Spark face of `BatchProcessor.run`
  * (`core/engine.py:97-161, 338-370`).
  *
  * The reference walks a tree calling processors per path in pre/inline/
  * post order; in a dataflow engine that becomes:
  *  - pre/inline: vectorized transforms over the subset of file rows
  *    matching each rule's glob (one `rlike` filter, schema-evolving
  *    re-union with the untouched rows);
  *  - post ("after children"): aggregations over the FINAL file frame —
  *    a post-order callback is exactly "consume the finished subtree",
  *    i.e. a groupBy over the already-transformed rows.
  *
  * Fail-soft: a processor that throws records an error step and the run
  * continues (`core/engine.py:519-543`); `mustExecute` errors rethrow.
  */
final class Runner(registry: Registry) {

  final case class Step(step: Int, phase: String, pattern: String,
                        processor: String, rows: Long, ok: Boolean,
                        error: Option[String])

  final case class Result(files: DataFrame,
                          postResults: Map[String, DataFrame],
                          steps: Seq[Step])

  /** Execute a plan over a file-inventory frame (must carry `pathCol`).
    * Returns the transformed file frame, the per-post-processor result
    * frames, and the step log.
    */
  def run(files: DataFrame, plan: PipelinePlan,
          pathCol: String = "rel_path"): Result = {
    val steps = mutable.ListBuffer.empty[Step]
    var n = 0

    def exec(df: DataFrame, rule: Rule): DataFrame = {
      n += 1
      val pred = TreeScan.matchesGlob(col(pathCol), rule.pattern)
      try {
        val matched = df.filter(pred)
        val rest = df.filter(!pred)
        val out = registry(rule.processor).fn(matched, rule.config)
        val merged = if (rest.isEmpty) out else Append.evolve(out, rest)
        steps += Step(n, rule.phase.toString, rule.pattern, rule.processor,
          -1L, ok = true, None)
        merged
      } catch {
        case e: Exception if !registry.contains(rule.processor) ||
            !registry(rule.processor).mustExecute =>
          steps += Step(n, rule.phase.toString, rule.pattern, rule.processor,
            -1L, ok = false, Some(e.getMessage))
          df
      }
    }

    val afterPre = plan.forPhase(Phase.Pre).foldLeft(files)(exec)
    val afterInline = plan.forPhase(Phase.Inline).foldLeft(afterPre)(exec)

    val postResults = mutable.LinkedHashMap.empty[String, DataFrame]
    plan.forPhase(Phase.Post).foreach { rule =>
      n += 1
      try {
        val matched = afterInline.filter(
          TreeScan.matchesGlob(col(pathCol), rule.pattern))
        postResults(rule.processor) = registry(rule.processor).fn(matched, rule.config)
        steps += Step(n, "Post", rule.pattern, rule.processor, -1L, ok = true, None)
      } catch {
        case e: Exception if !registry.contains(rule.processor) ||
            !registry(rule.processor).mustExecute =>
          steps += Step(n, "Post", rule.pattern, rule.processor, -1L,
            ok = false, Some(e.getMessage))
      }
    }
    Result(afterInline, postResults.toMap, steps.toList)
  }
}
