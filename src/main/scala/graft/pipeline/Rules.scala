package graft.pipeline

/** Rule-driven pipeline IR — SURVEY.md §3.1. The reference's YAML config
  * maps glob patterns to processor lists at three phases
  * (`core/engine.py:372-437`); this is that plan as a case-class IR.
  */
object Phase extends Enumeration {
  val Pre, Inline, Post = Value
}

/** One config rule: paths matching `pattern` run `processor` at `phase`.
  * Duplicates are preserved and priority sorts descending-stable —
  * the reference's "no dedup" scheduling (`core/engine.py:403-412`).
  */
final case class Rule(pattern: String, phase: Phase.Value, processor: String,
                      priority: Int = 0, config: Map[String, String] = Map.empty)

/** A resolved plan: rules in execution order per phase. */
final case class PipelinePlan(rules: Seq[Rule]) {
  def forPhase(p: Phase.Value): Seq[Rule] =
    rules.filter(_.phase == p).sortBy(-_.priority) // stable sort keeps config order on ties

  /** `simulate` analog (`core/engine.py:163-314`): the step sequence as
    * data, without executing anything.
    */
  def describe: Seq[String] =
    Seq(Phase.Pre, Phase.Inline, Phase.Post).flatMap { p =>
      forPhase(p).map(r => s"$p ${r.pattern} -> ${r.processor} (prio=${r.priority})")
    }
}
