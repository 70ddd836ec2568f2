package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The published Gopher REPETITION-rule battery (north-star ✚) — the
  * within-document repetition filters that complement
  * [[QualityRules]]'s content rules: duplicate line / paragraph
  * fractions (by count and by character mass), most-frequent-n-gram
  * character coverage (n = 2, 3, 4), and duplicated-n-gram character
  * coverage (n = 5…10), each with the paper's threshold as its own
  * flag. q56 is the corpus-level repetition SIGNAL (one n); this is
  * the per-document, per-rule battery a curation run actually filters
  * with.
  *
  * Signal definitions (all integers, so every flag is an integer
  * cross-multiplication the oracle replays bit-for-bit):
  *
  *   - lines = '\n' splits, paragraphs = '\n\n' splits (empty splits
  *     participate — two engines split identically, and a run of
  *     blank lines IS repetition);
  *   - duplicate mass = total − distinct (occurrences beyond each
  *     first). Character sums need no explode: total line chars =
  *     `length(text) − (n_lines − 1)` (the separators are the only
  *     non-line chars), distinct-line chars = `length` of the
  *     distinct array joined with an empty separator;
  *   - n-gram signals come from ONE codegen'd pass per n
  *     ([[graft.functions.GramRepStats]]): top coverage =
  *     maxCount × len(gram) of the most frequent gram (count ties →
  *     the longest, making the VALUE unique), duplicated coverage =
  *     Σ count × len over grams occurring ≥ 2 times — the published
  *     occurrence-count form of "fraction of characters in
  *     duplicated n-grams";
  *   - every fraction's denominator is `length(text)` (the paper
  *     normalizes by the document's characters).
  *
  * Scale shape: pure MAP-SIDE scan — no shuffle, no UDF; the nine
  * gram passes are static-call codegen inside whole-stage codegen, so
  * at 100 TB the battery fuses into whatever scan reads the text.
  */
object RepetitionRules {

  /** (threshold numerator, denominator) per rule — Gopher Table A1:
    * a document is REMOVED when signal/chars exceeds num/den, so the
    * pass flag is `signal × den ≤ chars × num`.
    */
  val TopGramThresholds: Seq[(Int, (Int, Int))] =
    Seq(2 -> (1, 5), 3 -> (9, 50), 4 -> (4, 25))
  val DupGramThresholds: Seq[(Int, (Int, Int))] =
    Seq(5 -> (3, 20), 6 -> (7, 50), 7 -> (13, 100),
        8 -> (3, 25), 9 -> (11, 100), 10 -> (1, 10))

  /** Per-document integer signals, prefixed `rep_` so the battery
    * never clobbers corpus columns (documents already has `n_chars`).
    */
  def signals(text: Column): Seq[(String, Column)] = {
    val lines = split(text, "\n")
    val paras = split(text, "\n\n")
    def dupChars(arr: Column, sepLen: Int): Column =
      (length(text) - (size(arr) - 1) * sepLen) -
        length(array_join(array_distinct(arr), ""))
    val gramSigs = (TopGramThresholds.map(_._1).map { n =>
      s"rep_top${n}_chars" ->
        graft.functions.GramFunctions.gramRepStats(text, n)
          .getField("top_gram_chars")
    }) ++ (DupGramThresholds.map(_._1).map { n =>
      s"rep_dup${n}_chars" ->
        graft.functions.GramFunctions.gramRepStats(text, n)
          .getField("dup_gram_chars")
    })
    Seq(
      "rep_chars" -> length(text).cast("long"),
      "rep_lines" -> size(lines).cast("long"),
      "rep_dup_lines" ->
        (size(lines) - size(array_distinct(lines))).cast("long"),
      "rep_dup_line_chars" -> dupChars(lines, 1).cast("long"),
      "rep_paras" -> size(paras).cast("long"),
      "rep_dup_paras" ->
        (size(paras) - size(array_distinct(paras))).cast("long"),
      "rep_dup_para_chars" -> dupChars(paras, 2).cast("long")) ++ gramSigs
  }

  /** Per-rule pass flags — Gopher constants, integer
    * cross-multiplied. A document keeps iff ALL pass.
    */
  def flags(df: DataFrame): DataFrame = {
    val base = df
      // duplicate line/paragraph count fractions: remove > 0.30
      .withColumn("r_dup_lines",
        col("rep_dup_lines") * 10 <= col("rep_lines") * 3)
      .withColumn("r_dup_paras",
        col("rep_dup_paras") * 10 <= col("rep_paras") * 3)
      // duplicate line/paragraph character fractions: remove > 0.20
      .withColumn("r_dup_line_chars",
        col("rep_dup_line_chars") * 5 <= col("rep_chars"))
      .withColumn("r_dup_para_chars",
        col("rep_dup_para_chars") * 5 <= col("rep_chars"))
    val withTop = TopGramThresholds.foldLeft(base) {
      case (d, (n, (num, den))) => d.withColumn(s"r_top${n}gram",
        col(s"rep_top${n}_chars") * den <= col("rep_chars") * num)
    }
    val withDup = DupGramThresholds.foldLeft(withTop) {
      case (d, (n, (num, den))) => d.withColumn(s"r_dup${n}gram",
        col(s"rep_dup${n}_chars") * den <= col("rep_chars") * num)
    }
    withDup.withColumn("keep",
      RuleCols.map(col).reduce(_ && _))
  }

  /** All rule-flag column names, in battery order. */
  val RuleCols: Seq[String] =
    Seq("r_dup_lines", "r_dup_paras", "r_dup_line_chars",
        "r_dup_para_chars") ++
      TopGramThresholds.map { case (n, _) => s"r_top${n}gram" } ++
      DupGramThresholds.map { case (n, _) => s"r_dup${n}gram" }

  /** Run the battery over `textCol`: input columns + signals + flags +
    * `keep`. Map-side only.
    */
  def battery(df: DataFrame, textCol: String = "text"): DataFrame =
    flags(signals(col(textCol)).foldLeft(df) {
      case (d, (n, c)) => d.withColumn(n, c)
    })
}
