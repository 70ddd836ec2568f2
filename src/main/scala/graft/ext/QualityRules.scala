package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The published heuristic quality-rule battery (north-star ✚) — the
  * Gopher/C4-family document filters a pre-training pipeline runs
  * before any model-based scoring: word-count bounds, mean word
  * length, symbol-to-word ratio, bullet/ellipsis line fractions,
  * alphabetic-word fraction, a stop-word floor, and the C4 code/boiler
  * rejects (curly braces, "lorem ipsum"). q25's composite keep flag is
  * the SHAPE of such a filter; this is the named, per-rule battery —
  * each rule a separate flag so a curation run can report WHY
  * documents drop (the per-rule failure counts are the knobs an
  * operator actually tunes).
  *
  * Every signal is an integer count and every threshold compare is
  * integer cross-multiplication (`10*symbols <= words` instead of
  * `symbols/words <= 0.1`), so there is no float boundary anywhere —
  * an oracle replaying the counts replays every flag bit-for-bit.
  * Patterns stay in the java.regex ∩ RE2 portable subset (the q98
  * rule). ASCII-only by design, like the reference battery: '…' and
  * unicode bullets are out of scope (the corpus convention here is
  * ASCII; see ZOrderCode's byte-order note for the same stance).
  *
  * Scale shape: the battery is a pure MAP-SIDE scan — no shuffle, no
  * UDF, all codegen'd builtins; at 100 TB it fuses into whatever scan
  * already reads the text column.
  */
object QualityRules {

  /** Gopher's stop-word list (the 8-word version). */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document integer signals. Words = single-space tokens (the
    * corpus convention, [[TextStats.wsTokens]]); lines = '\n' splits.
    */
  def signals(text: Column): Seq[(String, Column)] = {
    val words = split(text, " ")
    val lines = split(text, "\n")
    Seq(
      "n_words" -> size(words),
      // total word characters = non-space, non-newline chars — exact
      // and split-free (sum of word lengths without an explode)
      "n_word_chars" -> length(translate(text, " \n", "")),
      // '#' and non-overlapping '...' — Gopher's "symbol" markers
      "n_symbols" -> regexp_count(text, lit("#|\\.\\.\\.")),
      "n_lines" -> size(lines),
      "n_bullet_lines" -> size(filter(lines,
        l => l.startsWith("- ") || l.startsWith("* ") || l === "-" || l === "*")),
      "n_ellipsis_lines" -> size(filter(lines, l => l.endsWith("..."))),
      "n_alpha_words" -> size(filter(words, w => w.rlike("[A-Za-z]"))),
      "n_stop_hits" -> size(filter(split(lower(text), " "),
        w => w.isInCollection(Stopwords))),
      "has_brace" -> (text.contains("{") || text.contains("}")),
      "has_lorem" -> lower(text).contains("lorem ipsum"))
  }

  /** Per-rule pass flags from the signals — published constants,
    * integer cross-multiplied. A document keeps iff ALL pass.
    */
  def flags(df: DataFrame): DataFrame = df
    .withColumn("r_word_count",
      col("n_words") >= 50 && col("n_words") <= 100000)
    .withColumn("r_mean_word_len",
      col("n_word_chars") >= col("n_words") * 3 &&
        col("n_word_chars") <= col("n_words") * 10)
    .withColumn("r_symbol_ratio",
      col("n_symbols") * 10 <= col("n_words"))
    .withColumn("r_bullet_lines",
      col("n_bullet_lines") * 10 <= col("n_lines") * 9)
    .withColumn("r_ellipsis_lines",
      col("n_ellipsis_lines") * 10 <= col("n_lines") * 3)
    .withColumn("r_alpha_words",
      col("n_alpha_words") * 5 >= col("n_words") * 4)
    .withColumn("r_stopwords", col("n_stop_hits") >= 2)
    .withColumn("r_no_brace", !col("has_brace"))
    .withColumn("r_no_lorem", !col("has_lorem"))
    .withColumn("keep",
      col("r_word_count") && col("r_mean_word_len") &&
        col("r_symbol_ratio") && col("r_bullet_lines") &&
        col("r_ellipsis_lines") && col("r_alpha_words") &&
        col("r_stopwords") && col("r_no_brace") && col("r_no_lorem"))

  /** All rule-flag column names, in battery order. */
  val RuleCols: Seq[String] = Seq(
    "r_word_count", "r_mean_word_len", "r_symbol_ratio",
    "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
    "r_stopwords", "r_no_brace", "r_no_lorem")

  /** Run the battery over `textCol`: input columns + signals + flags +
    * `keep`. Map-side only.
    */
  def battery(df: DataFrame, textCol: String = "text"): DataFrame =
    flags(signals(col(textCol)).foldLeft(df) {
      case (d, (n, c)) => d.withColumn(n, c)
    })
}
