package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed battery for the C4 line-cleaning rules
  * ([[LineClean]]) and their composition with the HTML extractor.
  */
class LineCleanSpec extends SparkSpec {
  import spark.implicits._

  private def kept(text: String, minWords: Int = 5): Seq[String] =
    Seq(text).toDF("t")
      .select(LineClean.keptLines(col("t"), minWords).as("k"))
      .as[Seq[String]].head()

  private def keep(text: String, minLines: Int = 3): Boolean =
    Seq(text).toDF("t")
      .select(LineClean.pageKeep(col("t"), minLines = minLines))
      .as[Boolean].head()

  test("line rules: terminal punctuation, min words, javascript") {
    val page = Seq(
      "This line has exactly enough words here.",   // kept
      "Too short.",                                  // < 5 words
      "No terminal punctuation on this long line",   // no . ! ? "
      "Enable JavaScript to view this site please.", // javascript
      "Question lines are perfectly good lines, yes?", // kept (?)
      "\"Quoted lines ending in a quote are kept.\"", // kept (")
      "Exclamations with enough words count too, really!", // kept (!)
      "").mkString("\n")
    kept(page) shouldBe Seq(
      "This line has exactly enough words here.",
      "Question lines are perfectly good lines, yes?",
      "\"Quoted lines ending in a quote are kept.\"",
      "Exclamations with enough words count too, really!")
  }

  test("minWords is a parameter; case-insensitive javascript") {
    kept("one two three.", minWords = 3) shouldBe Seq("one two three.")
    kept("one two three.", minWords = 4) shouldBe Seq.empty
    kept("JAVASCRIPT required for this page to work.") shouldBe Seq.empty
  }

  test("page rules: min kept lines, code brace, lorem ipsum") {
    val good = Seq(
      "First good line with enough words here.",
      "Second good line with enough words here.",
      "Third good line with enough words here.").mkString("\n")
    keep(good) shouldBe true
    keep(good, minLines = 4) shouldBe false
    keep(good + "\nvar x = { a: 1 };") shouldBe false
    keep(good + "\nLorem Ipsum dolor sit amet.") shouldBe false
  }

  test("cleanedText rewrites the page from survivors only") {
    val page = "Keep this line with enough words here.\nshort\n" +
      "Also keep this second line with words."
    Seq(page).toDF("t")
      .select(LineClean.cleanedText(col("t"))).as[String].head() shouldBe
      "Keep this line with enough words here.\n" +
        "Also keep this second line with words."
    // nothing survives → empty page
    Seq("short").toDF("t")
      .select(LineClean.cleanedText(col("t"))).as[String].head() shouldBe ""
  }

  test("composes with HtmlToText: blocks become the judged lines") {
    val html = "<html><body><p>A good paragraph with enough words" +
      " here.</p><p>short</p><p>Another paragraph long enough to " +
      "survive the cut.</p></body></html>"
    val out = Seq(html).toDF("h")
      .select(LineClean.cleanedText(
        graft.functions.HtmlToTextFunctions.htmlToText(col("h"))))
      .as[String].head()
    out shouldBe "A good paragraph with enough words here.\n" +
      "Another paragraph long enough to survive the cut."
  }

  test("pure map-side: no exchange in the plan") {
    val plan = spark.range(4)
      .select(LineClean.pageKeep(concat(lit("line one has words here."),
        col("id").cast("string"))))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
