package graft.ext

import graft.SparkSpec
import graft.functions.HtmlText
import org.apache.spark.sql.functions._

/** Hand-computed battery for per-block extraction
  * ([[graft.functions.HtmlText.blocks]]) and the jusText-style block
  * classifier ([[Boilerplate]]) — plus the executable pin that
  * `extract` and `blocks` share one lexer.
  */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  test("blocks: per-line link-char counts, anchor depth, attribution") {
    // nav: everything rides anchors; the collapsed space between two
    // anchors is attributed to the char that follows it (inside the
    // next anchor)
    HtmlText.blocks(
      "<div><a href=\"/a\">Home</a> <a href=\"/b\">About</a></div>")
      .toSeq shouldBe Seq(("Home About", 10))
    // prose with one inline link: only the anchor text (plus its
    // leading collapsed space) counts
    HtmlText.blocks(
      "<p>Please read the <a href=\"/t\">terms</a> now.</p>")
      .toSeq shouldBe Seq(("Please read the terms now.", 6))
    // no anchors -> zero link chars; block boundaries split lines
    HtmlText.blocks("<p>one</p><p>two</p>").toSeq shouldBe
      Seq(("one", 0), ("two", 0))
    // anchors never leak across a flush; unclosed anchor is tolerated
    HtmlText.blocks("<p><a href=\"/x\">l</a>ink</p><p>after</p>")
      .toSeq shouldBe Seq(("link", 1), ("after", 0))
    // elided regions contribute nothing
    HtmlText.blocks(
      "<p><script>var a = '<a>no</a>';</script>kept</p>").toSeq shouldBe
      Seq(("kept", 0))
    // HTML5 no-nested-anchors: an <a> open while one is open
    // implicitly closes it, so the single </a> ends the anchor run and
    // an unclosed anchor cannot poison the rest of the document into
    // link chars (the common malformed-nav shape)
    HtmlText.blocks(
      "<p><a href=\"/x\">one<a href=\"/y\">two</a> prose tail.</p>" +
        "<p>Real prose of the and to.</p>").toSeq shouldBe
      Seq(("onetwo prose tail.", 6), ("Real prose of the and to.", 0))
    // an anchor left OPEN at a block boundary resets at the flush
    // (ADVICE r20): one unclosed nav <a> with no later </a> anywhere
    // must not count every following block's prose as link chars
    HtmlText.blocks(
      "<div><a href=\"/nav\">Menu</div><p>Real prose of the and to.</p>")
      .toSeq shouldBe Seq(("Menu", 4), ("Real prose of the and to.", 0))
  }

  test("extract ≡ blocks.map(text).mkString — one lexer, pinned") {
    val battery = Seq(
      "<html><body><p>a b</p><div>c<span>d</span></div></body></html>",
      "<p>x &amp; y &#65;&#x42;</p><p>z</p>",
      "<script>drop<p>this</p></script><p>keep</p>",
      "<!-- gone --><p>a &lt; b</p>",
      "<ul><li>one</li><li>two</li></ul>",
      "a < b text with <a href=\"q?a>b\">quoted</a> attr",
      "  spaced\t\n text  <br> next line ",
      "<p>unterminated <a href=\"/x\">anchor",
      "")
    battery.foreach { html =>
      HtmlText.blocks(html).map(_._1).mkString("\n") shouldBe
        HtmlText.extract(html)
    }
  }

  test("classifier: link density and stop-word density, boundary-exact") {
    import Boilerplate._
    def verdict(text: String, linkChars: Int): Boolean = {
      val df = Seq((text, linkChars)).toDF("t", "lc")
      df.select(isContent(col("t"), col("lc")).as("v"))
        .collect()(0).getBoolean(0)
    }
    // nav text: 10 of 10 chars linked -> boilerplate
    verdict("Home About", 10) shouldBe false
    // prose with a light link and dense stop words -> content
    verdict("Please read the terms of this policy for all of the details.",
      6) shouldBe true
    // stop-word-free spam -> boilerplate even with zero links
    verdict("Buy cheap widgets online today now fast", 0) shouldBe false
    // link-density boundary: "the and by" is 10 chars; 2 linked chars
    // sit EXACTLY at 1/5 (2*5 = 10*1, <= passes), 3 exceed it
    verdict("the and by", 2) shouldBe true
    verdict("the and by", 3) shouldBe false
    // stop-word boundary: 3 stop words of 10 sit EXACTLY at 3/10
    // (3*10 = 10*3, >= passes), 2 of 10 fall below
    verdict("the of to w w w w w w w", 0) shouldBe true
    verdict("the of w w w w w w w w", 0) shouldBe false
  }

  test("contentText: page rewritten from surviving blocks only") {
    val html =
      "<div><a href=\"/a\">Home</a> <a href=\"/b\">About</a> " +
        "<a href=\"/c\">Contact</a></div>" +
        "<p>Please read the terms of this policy for all of the " +
        "details here.</p>" +
        "<p>Buy cheap widgets online today now fast</p>" +
        "<div>Copyright 2020 <a href=\"/t\">Terms</a> " +
        "<a href=\"/p\">Privacy</a></div>"
    val df = Seq(html).toDF("html")
      .select(Boilerplate.contentText(
        graft.functions.HtmlToTextFunctions.htmlBlocks(col("html")))
        .as("t"))
    df.collect()(0).getString(0) shouldBe
      "Please read the terms of this policy for all of the details here."
  }
}
