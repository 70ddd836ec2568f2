package graft.pipeline

import graft.pipeline.ConfigText.{CList, CMap, CScalar, CVal}

/** A processor module loadable by name from config — the JVM analog of
  * the reference's `load_plugins` dynamic import
  * (`config/loader.py:115-126`): config names a module, loading it
  * populates the processor registry.
  */
trait ProcessorPlugin {
  def register(registry: Registry): Unit
}

/** Loaded config: the rule plan plus everything the reference's
  * top-level keys carry (`core/engine.py:376-383` skips these during
  * rule matching): run-once pre/post hooks, plugin module names, and
  * the builtin-recorder switch (`core/engine.py:414-435`).
  */
final case class LoadedConfig(
    plan: PipelinePlan,
    prePipeline: Option[(String, Map[String, String])],
    postPipeline: Option[(String, Map[String, String])],
    pluginClasses: Seq[String],
    enableBuiltinRecorders: Boolean,
    recordProcessor: String,
    persistProcessor: String) {

  /** Load the plugin classes named in config into `registry` —
    * `load_plugins` parity: each name is instantiated reflectively
    * (Scala `object` or zero-arg class implementing [[ProcessorPlugin]])
    * and registers its processors; later registrations win (the
    * reference reloads modules the same way).
    */
  def loadPlugins(registry: Registry): Unit =
    pluginClasses.foreach { name =>
      val plugin = ConfigLoader.instantiate(name)
      plugin.register(registry)
    }

  /** Builtin-recorder auto-injection (`core/engine.py:414-435`): when
    * enabled, append an inline record stage and a post persist stage —
    * match-everything pattern, minimum priority so the stable sort
    * keeps them LAST in their phase (the reference appends after its
    * priority sort). Mirrors the reference's guards: inject only
    * processors that are actually registered, and only if no rule in
    * that phase already names them; failure to inject is non-fatal.
    */
  def withBuiltinRecorders(registry: Registry): PipelinePlan = {
    if (!enableBuiltinRecorders) return plan
    var rules = plan.rules
    def named(phase: Phase.Value): Set[String] =
      rules.filter(_.phase == phase).map(_.processor).toSet
    if (recordProcessor.nonEmpty && registry.contains(recordProcessor) &&
        !named(Phase.Inline).contains(recordProcessor))
      rules = rules :+ Rule("**", Phase.Inline, recordProcessor, Int.MinValue)
    if (persistProcessor.nonEmpty && registry.contains(persistProcessor) &&
        !named(Phase.Post).contains(persistProcessor))
      rules = rules :+ Rule("**", Phase.Post, persistProcessor, Int.MinValue)
    PipelinePlan(rules)
  }
}

/** Config front end — the reference's primary entry point
  * (`cli/app.py:7-32` → `config/loader.py:28-58`): a YAML/JSON file of
  * glob-pattern rules IS the query language. This compiles either
  * format to the same [[PipelinePlan]] IR the programmatic API builds.
  *
  * Rule-value shapes accepted (all appear in the reference's configs):
  *  - mapping with `processors` / `pre_processors` / `post_processors`
  *    lists (block or flow), optional `config` map, `priority` int
  *    (`test/test1/config.yaml`);
  *  - a bare processor list (`/root/reference/config.yaml` maps
  *    `"*.txt"` straight to a list) → inline phase;
  *  - a bare scalar (single processor, `generate_template` shape).
  * Rule-level `must_execute` is parsed tolerantly and ignored — the
  * engine itself has it commented out (`core/engine.py:391`).
  */
object ConfigLoader {

  /** Top-level keys that are engine directives, not glob rules
    * (`core/engine.py:380-383` + recorder keys + our `plugins`).
    */
  private val reserved = Set(
    "pre_process", "post_process", "config_pre", "config_post",
    "enable_builtin_recorders", "builtin_recorders", "plugins")

  def fromYaml(text: String): LoadedConfig = fromTree(ConfigText.parseYaml(text))
  def fromJson(text: String): LoadedConfig = fromTree(ConfigText.parseJson(text))

  /** Suffix-dispatched file load (`load_config`, `config/loader.py:28-58`). */
  def load(path: String): LoadedConfig = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    val lower = path.toLowerCase
    if (lower.endsWith(".yaml") || lower.endsWith(".yml")) fromYaml(text)
    else if (lower.endsWith(".json")) fromJson(text)
    else throw new IllegalArgumentException(
      s"unsupported config format: $path (only .yaml/.yml/.json)")
  }

  private def scalarMap(v: CVal): Map[String, String] =
    v.asMap.map { case (k, s) => k -> s.asString }.toMap

  private def fromTree(root: CMap): LoadedConfig = {
    val rules = Seq.newBuilder[Rule]

    root.entries.filterNot { case (k, _) => reserved(k) }.foreach {
      case (pattern, rule: CMap) =>
        val config = rule.get("config").map(scalarMap).getOrElse(Map.empty)
        val priority = rule.get("priority").map(_.asInt).getOrElse(0)
        def add(phase: Phase.Value, key: String): Unit =
          rule.get(key).foreach(_.asList.foreach(p =>
            rules += Rule(pattern, phase, p.asString, priority, config)))
        add(Phase.Inline, "processors")
        add(Phase.Pre, "pre_processors")
        add(Phase.Post, "post_processors")
      case (pattern, CList(procs)) => // bare list → inline processors
        procs.foreach(p => rules += Rule(pattern, Phase.Inline, p.asString))
      case (pattern, CScalar(proc)) if proc.nonEmpty => // single processor
        rules += Rule(pattern, Phase.Inline, proc)
      case (pattern, other) =>
        throw new IllegalArgumentException(
          s"rule '$pattern' must map to a processor list or mapping, got $other")
    }

    val recorders = root.get("builtin_recorders").collect { case m: CMap => m }
    LoadedConfig(
      plan = PipelinePlan(rules.result()),
      prePipeline = root.get("pre_process").map(p => p.asString ->
        root.get("config_pre").map(scalarMap).getOrElse(Map.empty)),
      postPipeline = root.get("post_process").map(p => p.asString ->
        root.get("config_post").map(scalarMap).getOrElse(Map.empty)),
      pluginClasses = root.get("plugins").map(_.asList.map(_.asString)).getOrElse(Nil),
      enableBuiltinRecorders =
        root.get("enable_builtin_recorders").exists(_.asBool),
      recordProcessor = recorders.flatMap(_.get("record")).map(_.asString)
        .getOrElse("record_to_shared"),
      persistProcessor = recorders.flatMap(_.get("persist")).map(_.asString)
        .getOrElse("persist_history"))
  }

  /** Reflectively instantiate a plugin by fully-qualified name: a Scala
    * `object` (via its MODULE$ field) or a zero-arg class.
    */
  private[pipeline] def instantiate(name: String): ProcessorPlugin = {
    val cls =
      try Class.forName(name + "$")
      catch { case _: ClassNotFoundException => Class.forName(name) }
    val instance =
      if (cls.getName.endsWith("$")) cls.getField("MODULE$").get(null)
      else cls.getDeclaredConstructor().newInstance()
    instance match {
      case p: ProcessorPlugin => p
      case other => throw new IllegalArgumentException(
        s"plugin $name does not implement ProcessorPlugin (got ${other.getClass})")
    }
  }
}
