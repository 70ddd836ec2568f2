package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mixed-format line routing — SURVEY.md §2.1 S10/S11: one text source
  * holds `CSV:`-prefixed, `JSON:`-prefixed and plain-numeric lines
  * (`demos/demo3/plugins/word_plot_pipeline.py:70-130`,
  * `complex_demo_processor.py:54-97`), plus `_dict.txt` key-value files
  * with `#` comments (`processors/file_ops.py:216-249`).
  *
  * Implementation is a single `when`-chain projection — per-line
  * dispatch is map-side and codegen'd; unparseable cells become null
  * (the reference's skip-bad-cells tolerance, `io_helpers.py:29-33`)
  * instead of failing the scan.
  */
object LineRouter {

  /** Route tag for a line: 'csv' | 'json' | 'numeric' | 'other'. */
  def route(line: Column): Column =
    when(line.startsWith("CSV:"), "csv")
      .when(line.startsWith("JSON:"), "json")
      .when(line.rlike("^-?[0-9]+(\\.[0-9]+)?$"), "numeric")
      .otherwise("other")

  /** Extract the numeric payload per route:
    * CSV → second comma field; JSON → the "v" key; numeric → the line.
    * Bad cells null out rather than erroring.
    */
  def numericPayload(line: Column): Column =
    // try_cast/try_element_at: under ANSI mode (Spark 4 default) a
    // malformed cell or short CSV line must null out, not fail the scan.
    when(line.startsWith("CSV:"),
        try_element_at(split(regexp_replace(line, "^CSV:", ""), ","), lit(2))
          .try_cast("double"))
      .when(line.startsWith("JSON:"),
        get_json_object(regexp_replace(line, "^JSON:", ""), "$.v")
          .try_cast("double"))
      .when(line.rlike("^-?[0-9]+(\\.[0-9]+)?$"), line.try_cast("double"))
      .otherwise(lit(null).cast("double"))

  /** Key payload: CSV → first field; JSON → "k"; else null. */
  def keyPayload(line: Column): Column =
    when(line.startsWith("CSV:"),
        try_element_at(split(regexp_replace(line, "^CSV:", ""), ","), lit(1)))
      .when(line.startsWith("JSON:"),
        get_json_object(regexp_replace(line, "^JSON:", ""), "$.k"))
      .otherwise(lit(null).cast("string"))

  /** Route a frame of lines into (route, key, value) columns. */
  def parse(lines: DataFrame, lineCol: String = "value"): DataFrame =
    lines.select(
      col(lineCol).as("line"),
      route(col(lineCol)).as("route"),
      keyPayload(col(lineCol)).as("key"),
      numericPayload(col(lineCol)).as("num"))

  /** `_dict.txt` reader shape (S11): "<key><ws-or-comma><label>" lines,
    * `#` comments and blanks skipped. Returns (key, label).
    */
  def parseKvDict(lines: DataFrame, lineCol: String = "value"): DataFrame =
    lines
      .filter(!trim(col(lineCol)).startsWith("#") && length(trim(col(lineCol))) > 0)
      .select(
        regexp_extract(col(lineCol), "^([^\\s,]+)[\\s,]+(.+)$", 1).as("key"),
        regexp_extract(col(lineCol), "^([^\\s,]+)[\\s,]+(.+)$", 2).as("label"))
      .filter(length(col("key")) > 0)
}
