package graft.ext

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.functions._

/** C4's LINE-level cleaning (Raffel et al. 2020, §2.2 — the step the
  * paper runs between extraction and dedup, distinct from
  * [[QualityRules]]' document-level FLAGS): drop low-quality lines,
  * rewrite the page from the survivors, and drop pages left with too
  * little. The published rules, restricted to the portable predicate
  * set so a SQL oracle replays them bit-for-bit:
  *
  *  - a LINE is kept iff it ends in terminal punctuation
  *    (`. ! ? "`), has at least `minWords` whitespace-separated
  *    words, and does not mention "javascript" (case-insensitive);
  *  - a PAGE is kept iff at least `minLines` lines survive AND the
  *    (extracted) text contains neither `{` (code) nor
  *    "lorem ipsum" (boilerplate), case-insensitive.
  *
  * Composes with [[graft.functions.HtmlToText]]: extraction emits
  * one line per block element, which is exactly the unit these rules
  * judge (q154 chains the two end-to-end).
  *
  * Scale shape: pure map-side Column ops (split / filter lambdas /
  * concat) — fuses into the scan, no UDF, no shuffle.
  */
object LineClean {

  /** Lines of `text` surviving the C4 line rules. */
  def keptLines(text: Column, minWords: Int = 5): Column =
    F.filter(split(text, "\n"), l =>
      substring(l, -1, 1).isin(".", "!", "?", "\"") &&
        size(F.filter(split(l, " "), w => w =!= "")) >= minWords &&
        !contains(lower(l), lit("javascript")))

  /** The page rewritten from its surviving lines (empty string when
    * none survive).
    */
  def cleanedText(text: Column, minWords: Int = 5): Column =
    concat_ws("\n", keptLines(text, minWords))

  /** The C4 page predicate over the line-cleaned page. */
  def pageKeep(text: Column, minWords: Int = 5,
               minLines: Int = 3): Column =
    size(keptLines(text, minWords)) >= minLines &&
      !contains(text, lit("{")) &&
      !contains(lower(text), lit("lorem ipsum"))
}
