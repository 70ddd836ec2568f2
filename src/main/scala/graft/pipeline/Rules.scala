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

object PipelinePlan {

  /** Parse the line-based rule config — the "config is the query
    * language" stage of `cli/app.py` → `config/loader.py:28-58`
    * (dependency-free here; a YAML front end maps to the same IR).
    * Line shape: `rule pattern=<glob> phase=pre|inline|post
    * processor=<name> priority=<int> cfg.<key>=<value>`, with `#`
    * comments and blank lines skipped. Unknown phases fail fast;
    * duplicate rules are preserved (the reference's no-dedup
    * scheduling).
    */
  def parseConfig(lines: Seq[String]): PipelinePlan = {
    val rules = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        require(line.startsWith("rule "), s"unknown directive: $line")
        val kvs = line.drop(5).split("\\s+").map { tok =>
          val i = tok.indexOf('=')
          require(i > 0, s"malformed token '$tok' in: $line")
          tok.take(i) -> tok.drop(i + 1)
        }.toSeq
        val m = kvs.toMap
        val phase = m.getOrElse("phase", "inline") match {
          case "pre"    => Phase.Pre
          case "inline" => Phase.Inline
          case "post"   => Phase.Post
          case other    => throw new IllegalArgumentException(
            s"unknown phase '$other' in: $line")
        }
        Rule(
          pattern = m.getOrElse("pattern",
            throw new IllegalArgumentException(s"rule needs pattern=: $line")),
          phase = phase,
          processor = m.getOrElse("processor",
            throw new IllegalArgumentException(s"rule needs processor=: $line")),
          priority = m.get("priority").map(_.toInt).getOrElse(0),
          config = kvs.collect { case (k, v) if k.startsWith("cfg.") =>
            k.drop(4) -> v }.toMap)
      }
    PipelinePlan(rules)
  }
}

/** A resolved plan: rules in execution order per phase. */
final case class PipelinePlan(rules: Seq[Rule]) {
  def forPhase(p: Phase.Value): Seq[Rule] =
    // stable sort keeps config order on ties; .toLong so Int.MinValue
    // (the injected-recorder "always last" priority) doesn't overflow
    rules.filter(_.phase == p).sortBy(-_.priority.toLong)

  /** `simulate` analog (`core/engine.py:163-314`): the step sequence as
    * data, without executing anything.
    */
  def describe: Seq[String] =
    Seq(Phase.Pre, Phase.Inline, Phase.Post).flatMap { p =>
      forPhase(p).map(r => s"$p ${r.pattern} -> ${r.processor} (prio=${r.priority})")
    }
}
