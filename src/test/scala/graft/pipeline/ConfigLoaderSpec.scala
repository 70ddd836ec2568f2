package graft.pipeline

import graft.SparkSpec
import graft.pipeline.ConfigText.{CList, CMap, CScalar}
import org.apache.spark.sql.functions._

/** Config front end: YAML-subset + JSON parsing against the exact
  * shapes the reference's demo configs use, rule compilation, plugin
  * loading, and builtin-recorder injection (`config/loader.py:28-58,
  * 115-126`; `core/engine.py:414-435`).
  */
class ConfigLoaderSpec extends SparkSpec {
  import spark.implicits._

  // ---- YAML subset parser -------------------------------------------

  test("parses the demo3 shape: quoted keys, block lists, config maps") {
    val y = ConfigText.parseYaml(
      """".":
        |  pre_processors:
        |    - enter_dir_write_word
        |  config:
        |    doc_path: demos/output.docx
        |
        |"**/*.txt":
        |  pre_processors:
        |    - read_data_files
        |  config:
        |    pattern: "*.txt"
        |    key: values
        |""".stripMargin)
    y.entries.map(_._1) shouldBe Seq(".", "**/*.txt")
    val txt = y.get("**/*.txt").get.asMap.toMap
    txt("pre_processors").asList.map(_.asString) shouldBe Seq("read_data_files")
    txt("config").asMap.toMap.view.mapValues(_.asString).toMap shouldBe
      Map("pattern" -> "*.txt", "key" -> "values")
  }

  test("parses the test1 shape: same-indent lists, priority, comments") {
    val y = ConfigText.parseYaml(
      """pre_process: setup_env
        |config_pre:
        |  path: ./backup
        |'*.txt':
        |  processors:
        |  - backup_file
        |  - add_prefix
        |  config:
        |    prefix: '[text]'
        |  priority: 10   # trailing comment
        |'*':
        |  processors: ["backup_file"]
        |  priority: 1
        |""".stripMargin)
    y.get("pre_process").get.asString shouldBe "setup_env"
    val txt = y.get("*.txt").get.asMap.toMap
    txt("processors").asList.map(_.asString) shouldBe Seq("backup_file", "add_prefix")
    txt("priority").asInt shouldBe 10
    y.get("*").get.asMap.toMap.apply("processors")
      .asList.map(_.asString) shouldBe Seq("backup_file")
  }

  test("parses the bare-list rule shape of the root config.yaml") {
    val cfg = ConfigLoader.fromYaml(
      """"*.txt":
        |  - add_prefix
        |  - backup_file
        |"data/": compress_files
        |""".stripMargin)
    cfg.plan.rules shouldBe Seq(
      Rule("*.txt", Phase.Inline, "add_prefix"),
      Rule("*.txt", Phase.Inline, "backup_file"),
      Rule("data/", Phase.Inline, "compress_files"))
  }

  test("JSON configs compile to the same plan as YAML") {
    val yaml = ConfigLoader.fromYaml(
      """"**/*.csv":
        |  processors:
        |    - process_data_file
        |  config:
        |    sep: ","
        |  priority: 3
        |""".stripMargin)
    val json = ConfigLoader.fromJson(
      """{"**/*.csv": {"processors": ["process_data_file"],
        |  "config": {"sep": ","}, "priority": 3}}""".stripMargin)
    json.plan shouldBe yaml.plan
  }

  test("load() dispatches on file suffix like load_config") {
    val dir = java.nio.file.Files.createTempDirectory("cfg").toFile
    val yml = new java.io.File(dir, "c.yaml")
    java.nio.file.Files.write(yml.toPath,
      "\"*.txt\":\n  processors: [wc]\n".getBytes)
    ConfigLoader.load(yml.getPath).plan.rules.head.processor shouldBe "wc"
    val bad = new java.io.File(dir, "c.toml")
    java.nio.file.Files.write(bad.toPath, "x".getBytes)
    an[IllegalArgumentException] should be thrownBy ConfigLoader.load(bad.getPath)
  }

  test("global hooks and plugin list parse; reserved keys are not rules") {
    val cfg = ConfigLoader.fromYaml(
      """pre_process: setup_env
        |config_pre:
        |  path: ./backup
        |post_process: generate_report
        |plugins:
        |  - graft.pipeline.plugins.DocPipelinePlugin
        |"*.txt":
        |  processors: [wc]
        |""".stripMargin)
    cfg.prePipeline shouldBe Some("setup_env" -> Map("path" -> "./backup"))
    cfg.postPipeline shouldBe Some("generate_report" -> Map.empty)
    cfg.pluginClasses shouldBe Seq("graft.pipeline.plugins.DocPipelinePlugin")
    cfg.plan.rules.map(_.pattern) shouldBe Seq("*.txt")
  }

  // ---- plugin loading + recorder injection --------------------------

  test("loadPlugins registers the plugin's processors (last wins)") {
    val cfg = ConfigLoader.fromYaml(
      "plugins:\n  - graft.pipeline.plugins.DocPipelinePlugin\n")
    val reg = new Registry
    cfg.loadPlugins(reg)
    reg.contains("word_count") shouldBe true
    reg.contains("record_to_shared") shouldBe true
    reg.contains("persist_history") shouldBe true
  }

  test("unknown plugin class fails loudly") {
    val cfg = ConfigLoader.fromYaml("plugins: [graft.NoSuchPlugin]\n")
    a[ClassNotFoundException] should be thrownBy cfg.loadPlugins(new Registry)
  }

  test("recorder injection appends registered recorders last, once") {
    val cfg = ConfigLoader.fromYaml(
      """enable_builtin_recorders: yes
        |builtin_recorders:
        |  record: record_to_shared
        |  persist: persist_history
        |"**/*.txt":
        |  processors: [word_count]
        |  priority: 5
        |"**":
        |  post_processors: [dir_stats]
        |""".stripMargin)
    val reg = new Registry
    ConfigLoader.fromYaml(
      "plugins: [graft.pipeline.plugins.DocPipelinePlugin]\n").loadPlugins(reg)
    val plan = cfg.withBuiltinRecorders(reg)
    plan.forPhase(Phase.Inline).map(_.processor) shouldBe
      Seq("word_count", "record_to_shared") // injected LAST despite sort
    plan.forPhase(Phase.Post).map(_.processor) shouldBe
      Seq("dir_stats", "persist_history")
    // idempotent against explicit mention: a rule already naming the
    // recorder suppresses injection (engine.py:421-424)
    val cfg2 = ConfigLoader.fromYaml(
      """enable_builtin_recorders: true
        |"**":
        |  processors: [record_to_shared]
        |""".stripMargin)
    cfg2.withBuiltinRecorders(reg).forPhase(Phase.Inline)
      .count(_.processor == "record_to_shared") shouldBe 1
  }

  test("injection skips unregistered recorders and disabled configs") {
    val reg = new Registry
    val enabledButUnregistered = ConfigLoader.fromYaml(
      "enable_builtin_recorders: true\n\"*\":\n  processors: [x]\n")
    enabledButUnregistered.withBuiltinRecorders(reg).rules.map(_.processor) shouldBe Seq("x")
    val disabled = ConfigLoader.fromYaml("\"*\":\n  processors: [x]\n")
    disabled.enableBuiltinRecorders shouldBe false
    disabled.withBuiltinRecorders(reg) shouldBe disabled.plan
  }

  // ---- end-to-end (test_validate.py:26-67 shape) ---------------------

  test("config-defined pipeline runs end-to-end with injected history") {
    val tmp = java.nio.file.Files.createTempDirectory("hist").toString
    val files = Seq(
      ("a/en/x.txt", "hello world", "a"),
      ("a/de/y.txt", "hallo welt zusammen", "a"),
      ("b/en/z.txt", "one two three", "b")
    ).toDF("rel_path", "text", "source")
    val cfg = ConfigLoader.fromYaml(
      s"""plugins: [graft.pipeline.plugins.DocPipelinePlugin]
         |enable_builtin_recorders: true
         |builtin_recorders:
         |  record: record_to_shared
         |  persist: persist_history
         |"*/en/*":
         |  pre_processors: [tag_en]
         |"**/*.txt":
         |  processors: [word_count]
         |"**":
         |  post_processors: [dir_stats]
         |  config:
         |    history_dir: $tmp/h
         |""".stripMargin)
    val reg = new Registry
    cfg.loadPlugins(reg)
    // make the injected persist write into the temp dir for assertion
    reg.register("persist_history", kind = "post") { (df, _) =>
      reg.all.find(_.name == "dir_stats") // no-op lookup, keep df
      val sink = new graft.sinks.History(df.sparkSession, s"$tmp/h")
      sink.enqueue(graft.sinks.History.Record(
        java.time.Instant.now.toString, "test", "post", "**",
        "persist_history", "ok", 0L, df.count(), ""))
      sink.flush()
      df
    }
    val result = new Runner(reg).run(files, cfg.withBuiltinRecorders(reg))
    val stats = result.postResults("dir_stats").orderBy("source").collect()
    stats.map(_.getString(0)) shouldBe Array("a", "b")
    stats.map(_.getLong(1)) shouldBe Array(2L, 1L)        // n_files
    stats.map(_.getLong(2)) shouldBe Array(1L, 1L)        // n_en
    stats.map(_.getLong(3)) shouldBe Array(5L, 3L)        // total_words
    stats.map(_.getLong(4)) shouldBe Array(2L, 1L)        // n_recorded (injected!)
    // the injected post persist ran and left a history batch behind
    spark.read.parquet(s"$tmp/h").count() shouldBe 1L
  }
}
