package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Boilerplate BLOCK classification (north-star ✚) — the step the
  * published extractors (jusText, readability) run between raw
  * HTML→text extraction and line-level cleaning: [[graft.functions.HtmlToText]]
  * strips markup but keeps nav/footer TEXT, and a corpus built
  * without block classification carries "Home About Contact" and
  * "Copyright … Terms Privacy" into every downstream statistic. The
  * jusText signals, restricted to integer arithmetic so a SQL oracle
  * replays the verdicts bit-for-bit:
  *
  *  - '''link density''': a block whose anchor-text characters
  *    ([[graft.functions.HtmlText.blocks]]' `link_chars`) exceed
  *    `linkNum/linkDen` of its total characters is boilerplate —
  *    navigation is mostly links, prose is not;
  *  - '''stop-word density''': a content block's words are at least
  *    `stopNum/stopDen` stop words — prose in a language is dense in
  *    its function words, while link lists, headings and spam are
  *    not. Tokens are the extractor's collapsed single-space split,
  *    matched lowercase and exactly (punctuation attached to a word
  *    makes it a non-stop token — same rule in the oracle).
  *
  * Both thresholds compare by CROSS-MULTIPLICATION (`a·den ≤ b·num`),
  * never by a float division, so engine and oracle agree on every
  * boundary case.
  *
  * Scale shape: pure map-side Column ops over the `html_blocks`
  * array — filter/transform lambdas fused into the scan; the page is
  * rewritten from surviving blocks without any shuffle.
  */
object Boilerplate {

  /** English function words (the jusText stop-list shape, truncated
    * to a deterministic built-in set — a real deployment loads the
    * language's full list as data, same stance as
    * [[UrlOps.MultiLabelSuffixes]]).
    */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "at", "by",
    "for", "with", "is", "are", "was", "were", "be", "been", "it",
    "its", "this", "that", "these", "those", "as", "from", "but",
    "not", "all", "we", "you", "they", "he", "she", "his", "her",
    "their", "our", "your", "have", "has", "had", "will", "would",
    "can", "could", "about", "into", "over", "after", "before")

  /** Words of a collapsed block (single-space split, empties out). */
  def wordCount(text: Column): Column =
    size(filter(split(text, " "), w => w =!= ""))

  /** Lowercase-exact stop-word occurrences among the block's words. */
  def stopwordCount(text: Column): Column =
    size(filter(split(lower(text), " "), w => w.isInCollection(Stopwords)))

  /** The block-level content verdict: link density ≤ linkNum/linkDen
    * AND stop-word density ≥ stopNum/stopDen, both cross-multiplied.
    */
  def isContent(text: Column, linkChars: Column,
                linkNum: Int = 1, linkDen: Int = 5,
                stopNum: Int = 3, stopDen: Int = 10): Column =
    linkChars * lit(linkDen) <= length(text) * lit(linkNum) &&
      stopwordCount(text) * lit(stopDen) >= wordCount(text) * lit(stopNum)

  /** The page rewritten from its content blocks (empty string when
    * none survive): `html_blocks` → verdict filter → newline join —
    * the text [[LineClean]] then cleans line by line.
    */
  def contentText(blocks: Column,
                  linkNum: Int = 1, linkDen: Int = 5,
                  stopNum: Int = 3, stopDen: Int = 10): Column =
    concat_ws("\n", transform(
      filter(blocks, b => isContent(b.getField("text"),
        b.getField("link_chars"), linkNum, linkDen, stopNum, stopDen)),
      b => b.getField("text")))
}
