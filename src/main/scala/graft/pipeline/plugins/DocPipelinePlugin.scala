package graft.pipeline.plugins

import org.apache.spark.sql.functions._
import graft.pipeline.{ProcessorPlugin, Registry}
import graft.sinks.History

/** Demo processor plugin — the analog of a reference plugin module
  * (`demos/demo3/plugins/word_plot_pipeline.py`,
  * `demos/demo/plugins/...`): a user-authored file that `load_plugins`
  * imports by name from config, whose import registers processors.
  * Here the config names this class and [[graft.pipeline.LoadedConfig
  * .loadPlugins]] instantiates it.
  */
object DocPipelinePlugin extends ProcessorPlugin {

  def register(registry: Registry): Unit = {
    registry.register("tag_en", kind = "pre") { (df, _) =>
      df.withColumn("is_en", lit(1))
    }
    registry.register("word_count") { (df, cfg) =>
      val sep = cfg.getOrElse("sep", " ")
      df.withColumn("n_words", size(split(col("text"), sep)))
    }
    // the reference's default inline recorder name
    // (`core/engine.py:418` → 'record_to_shared')
    registry.register("record_to_shared") { (df, _) =>
      df.withColumn("recorded", lit(1))
    }
    // post persistence: one history batch per run (the injected analog
    // of 'persist_history_sqlite'); returns its input so the runner's
    // post-result frame stays inspectable.
    registry.register("persist_history", kind = "post") { (df, cfg) =>
      val dir = cfg.getOrElse("history_dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_history")
      val sink = new History(df.sparkSession, dir)
      sink.enqueue(History.Record(
        ts = java.time.Instant.now.toString, run_id = "config-run",
        phase = "post", path = "**", processor = "persist_history",
        status = "ok", duration_ms = 0L, rows = -1L, error = ""))
      sink.flush()
      df
    }
    registry.register("dir_stats", kind = "post") { (df, _) =>
      df.groupBy(col("source"))
        .agg(count(lit(1)).as("n_files"),
             coalesce(sum(col("is_en")), lit(0)).cast("long").as("n_en"),
             sum(col("n_words")).as("total_words"),
             sum(col("recorded")).as("n_recorded"))
    }
  }
}
