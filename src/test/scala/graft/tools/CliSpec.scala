package graft.tools

import graft.SparkSpec
import graft.pipeline.{ProcessorPlugin, Registry}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Test plugin working on the CLI's tree-inventory columns
  * (rel_path, name, size, mtime, depth).
  */
object InventoryPlugin extends ProcessorPlugin {
  override def register(registry: Registry): Unit = {
    registry.register("tag_txt") { (df, _) =>
      df.withColumn("is_txt", lit(1))
    }
    registry.register("top_dir_stats", kind = "post") { (df, _) =>
      df.groupBy(substring_index(col("rel_path"), "/", 1).as("top_dir"))
        .agg(count(lit(1)).as("n_files"),
             coalesce(sum(col("is_txt")), lit(0)).as("n_txt"),
             sum(col("size")).as("bytes"))
        .orderBy(col("top_dir"))
    }
  }
}

/** CLI front end (`cli/app.py` parity): template generation, processor
  * listing, simulate, and a real run writing post-result + step CSVs.
  */
class CliSpec extends SparkSpec {

  private def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeTree(): String = {
    val root = tempDir("graft_cli_tree_")
    Files.createDirectories(Paths.get(s"$root/a"))
    Files.createDirectories(Paths.get(s"$root/b"))
    Files.writeString(Paths.get(s"$root/a/x.txt"), "hello world\n")
    Files.writeString(Paths.get(s"$root/b/y.txt"), "more text\n")
    Files.writeString(Paths.get(s"$root/b/z.log"), "log line\n")
    root
  }

  private val configYaml =
    """plugins:
      |  - graft.tools.InventoryPlugin
      |"**/*.txt":
      |  processors:
      |    - tag_txt
      |"**":
      |  post_processors:
      |    - top_dir_stats
      |""".stripMargin

  test("generate-template writes a parseable config") {
    spark // ensure the shared session exists before Cli looks for one
    val path = s"${tempDir("graft_cli_tpl_")}/config.yaml"
    Cli.main(Array("--generate-template", path))
    val cfg = graft.pipeline.ConfigLoader.fromYaml(Files.readString(Paths.get(path)))
    cfg.plan.rules.map(_.pattern) should contain allOf ("**/*.txt", "**/*.log")
  }

  test("run executes the config pipeline and writes post results + steps") {
    spark
    val root = writeTree()
    val cfgPath = s"${tempDir("graft_cli_cfg_")}/c.yaml"
    Files.writeString(Paths.get(cfgPath), configYaml)
    val out = tempDir("graft_cli_out_")
    Cli.main(Array(root, "--config", cfgPath, "--output", out))

    val stats = spark.read.option("header", "true").csv(s"$out/top_dir_stats")
    stats.count() shouldBe 2
    stats.where(col("top_dir") === "a").select("n_txt").head().getString(0) shouldBe "1"
    stats.where(col("top_dir") === "b").select("n_files").head().getString(0) shouldBe "2"
    spark.read.option("header", "true").csv(s"$out/steps").count() should be >= 2L
  }

  test("simulate mode dry-runs without writing results") {
    spark
    val root = writeTree()
    val cfgPath = s"${tempDir("graft_cli_cfg_")}/c.yaml"
    Files.writeString(Paths.get(cfgPath), configYaml)
    val out = tempDir("graft_cli_out_")
    Cli.main(Array(root, "--config", cfgPath, "--output", out, "--simulate"))
    Files.exists(Paths.get(s"$out/top_dir_stats")) shouldBe false
  }

  test("shared session survives a CLI invocation") {
    val root = writeTree()
    val cfgPath = s"${tempDir("graft_cli_cfg_")}/c.yaml"
    Files.writeString(Paths.get(cfgPath), configYaml)
    Cli.main(Array(root, "--config", cfgPath, "--output", tempDir("graft_cli_out_")))
    spark.range(1).count() shouldBe 1 // would throw on a stopped context
  }
}
