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
object Runner {
  /** Top-level (not inner) case classes: Spark can't derive an Encoder
    * for an inner class, and the CLI frames the step log via toDF.
    */
  final case class Step(step: Int, phase: String, pattern: String,
                        processor: String, rows: Long, ok: Boolean,
                        error: Option[String])

  final case class Result(files: DataFrame,
                          postResults: Map[String, DataFrame],
                          steps: Seq[Step])
}

final class Runner(registry: Registry) {
  import Runner.{Result, Step}

  /** Execute a plan over a file-inventory frame (must carry `pathCol`).
    * Returns the transformed file frame, the per-post-processor result
    * frames, and the step log.
    *
    * `cancel`: checked BETWEEN rules (the reference's `_is_cancelled`
    * early return, `core/engine.py:127,360-361,477-478`) — once set, no
    * further rule is planned and the partial result is returned with a
    * terminal "cancelled" step. In-flight Spark jobs are killed by the
    * token's job group, not by this check.
    */
  def run(files: DataFrame, plan: PipelinePlan,
          pathCol: String = "rel_path",
          cancel: Option[CancelToken] = None,
          status: Option[StatusLog] = None): Result = {
    val steps = mutable.ListBuffer.empty[Step]
    var n = 0

    def cancelled: Boolean = cancel.exists(_.isCancelled)
    def markCancelled(phase: String): Unit =
      steps += Step(n + 1, phase, "", "", -1L, ok = false, Some("cancelled"))

    def exec(df: DataFrame, rule: Rule): DataFrame = {
      n += 1
      status.foreach(_.set(s"${rule.phase} ${rule.pattern} -> ${rule.processor}"))
      val pred = TreeScan.matchesGlob(col(pathCol), rule.pattern)
      try {
        val matched = df.filter(pred)
        // plan-level emptiness: a match-everything pattern leaves no
        // remainder, so skip the union entirely — this both avoids the
        // old per-rule eager `rest.isEmpty` Spark job AND keeps the
        // processor's exact output schema (a data-level-empty union
        // would null-fill every column the processor dropped).
        val matchesAll = TreeScan.isMatchAll(rule.pattern)
        val out = registry(rule.processor).fn(matched, rule.config)
        val merged =
          if (matchesAll) out
          else Append.evolve(out, df.filter(!pred))
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

    /** foldLeft with the between-step cancellation check. */
    def phaseFold(start: DataFrame, rules: Seq[Rule]): DataFrame =
      rules.foldLeft(start) { (df, rule) =>
        if (cancelled) df else exec(df, rule)
      }

    val afterPre = phaseFold(files, plan.forPhase(Phase.Pre))
    val afterInline = phaseFold(afterPre, plan.forPhase(Phase.Inline))

    val postResults = mutable.LinkedHashMap.empty[String, DataFrame]
    plan.forPhase(Phase.Post).foreach { rule =>
      if (!cancelled) {
        n += 1
        status.foreach(_.set(s"Post ${rule.pattern} -> ${rule.processor}"))
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
    }
    if (cancelled) markCancelled("Run")
    status.foreach(_.set(if (cancelled) "cancelled" else "done"))
    Result(afterInline, postResults.toMap, steps.toList)
  }

  /** Dry-run plan — the reference's `simulate` (`core/engine.py:163-314`):
    * which processor would run for which path, per phase, WITHOUT
    * executing anything. One distributed pass: the rule table (glob
    * pre-compiled to regex at plan time) is exploded against the file
    * frame and matched with `regexp_like` — no per-rule scan, no
    * driver-side walk, so a dry run over a billion-file inventory is
    * the same shape as the real run.
    *
    * @param patternFilter reference's substring path filter
    * @param maxItems      reference's entry cap (`LIMIT`)
    */
  def simulate(files: DataFrame, plan: PipelinePlan,
               pathCol: String = "rel_path",
               patternFilter: Option[String] = None,
               maxItems: Option[Int] = None): DataFrame = {
    val ordered = Seq(Phase.Pre, Phase.Inline, Phase.Post)
      .flatMap(p => plan.forPhase(p))
    // ONE schema definition for both branches
    val outCols = Seq("path", "phase", "pattern", "processor", "priority",
      "step_order")
    if (ordered.isEmpty) {
      // explode(array()) would resolve to NullType and fail field
      // extraction — an empty plan is a valid dry run, return no steps
      import files.sparkSession.implicits._
      return Seq.empty[(String, String, String, String, Int, Int)]
        .toDF(outCols: _*)
    }
    val ruleRows = ordered.zipWithIndex.map { case (r, i) =>
      struct(
        lit(i).as("step_order"),
        lit(r.phase.toString).as("phase"),
        lit(r.pattern).as("pattern"),
        lit(TreeScan.globToRegex(r.pattern)).as("regex"),
        lit(r.processor).as("processor"),
        lit(r.priority).as("priority"))
    }
    val base = files.select(col(pathCol).as("path"))
    val filtered = patternFilter.fold(base)(s => base.filter(col("path").contains(s)))
    val sim = filtered
      .select(col("path"), explode(array(ruleRows: _*)).as("rule"))
      .filter(call_function("regexp_like", col("path"), col("rule.regex")))
      .select(col("path") +: outCols.tail.map(c => col(s"rule.$c").as(c)): _*)
      .orderBy(col("path"), col("step_order"))
    maxItems.fold(sim)(sim.limit)
  }
}
