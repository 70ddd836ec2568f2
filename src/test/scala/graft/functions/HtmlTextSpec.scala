package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reference battery for the tolerant HTML→text lexer — hand-computed
  * expectations for every rule in the [[HtmlText]] contract, plus the
  * Column face (codegen) equality and the no-exchange plan shape.
  */
class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  private def x(html: String): String = HtmlText.extract(html)

  test("tags strip; block tags are line boundaries; inline tags are not") {
    x("<p>one</p><p>two</p>") shouldBe "one\ntwo"
    x("<div>a<span>b</span>c</div>") shouldBe "abc"
    x("<ul><li>x</li><li>y</li></ul>") shouldBe "x\ny"
    x("a<br>b<br/>c") shouldBe "a\nb\nc"
    x("<h1>Title</h1>body text") shouldBe "Title\nbody text"
    x("<table><tr><td>1</td><td>2</td></tr></table>") shouldBe "1\n2"
    // inline boundary does NOT insert space: b/i are inline
    x("nob<b>old</b>") shouldBe "nobold"
  }

  test("script/style content is elided, tolerant of markup inside") {
    x("""<script>var s = "<p>trap</p>"; if (a<b && b>c) {}</script>ok""") shouldBe "ok"
    x("<style>p > a { color: #fff; }</style>ok") shouldBe "ok"
    x("<SCRIPT>x</SCRIPT>ok") shouldBe "ok"
    x("<script>never closed") shouldBe ""
    // </scriptx> is NOT the close tag; </script > is
    x("<script>a</scriptx>b</script >c") shouldBe "c"
    // script with attributes
    x("""<script type="text/javascript">x</script>ok""") shouldBe "ok"
  }

  test("comments, doctype and processing instructions are elided") {
    x("<!-- a <p>trap</p> -->ok") shouldBe "ok"
    x("<!DOCTYPE html>ok") shouldBe "ok"
    x("<?xml version=\"1.0\"?>ok") shouldBe "ok"
    x("a<!-- never closed") shouldBe "a"
  }

  test("quote-aware attribute scan") {
    x("""<a href="q?a>b">link</a>""") shouldBe "link"
    x("""<a href='q?a>b'>link</a>""") shouldBe "link"
    x("""<img alt="x > y"/>z""") shouldBe "z"
  }

  test("entities: named, decimal, hex; invalid kept literally") {
    x("a &amp; b") shouldBe "a & b"
    x("&lt;p&gt; is text") shouldBe "<p> is text"
    x("&quot;q&quot; &apos;a&apos;") shouldBe "\"q\" 'a'"
    x("a&nbsp;b") shouldBe "a b"
    x("&#65;&#x42;&#x63;") shouldBe "ABc"
    // supplementary plane
    x("&#x1F600;") shouldBe new String(Character.toChars(0x1F600))
    // invalid forms stay literal
    x("a & b") shouldBe "a & b"
    x("&bogus; &amp &#; &#xZZ; &#x110000;") shouldBe "&bogus; &amp &#; &#xZZ; &#x110000;"
    // decoded '<' is TEXT, not re-lexed
    x("&lt;script&gt;x&lt;/script&gt;") shouldBe "<script>x</script>"
  }

  test("stray '<' is literal text") {
    x("a < b and a <3 u") shouldBe "a < b and a <3 u"
    x("5<6") shouldBe "5<6"
    x("tail<") shouldBe "tail<"
    x("a </3 b") shouldBe "a </3 b"
  }

  test("whitespace collapses within a line; empty lines drop") {
    x("<p>  a\t\tb\nc  </p>") shouldBe "a b c"
    x("<p>   </p><p>x</p>") shouldBe "x"
    x("<div>\n</div>\n<div>y</div>") shouldBe "y"
    x("") shouldBe ""
    x("   \n\t ") shouldBe ""
    // vertical tab and form feed are in the portable class
    x("a\u000Bb\fc") shouldBe "a b c"
  }

  test("full template extraction (the q151 shape)") {
    val html =
      """<!DOCTYPE html><html><head><title>Doc 7</title>""" +
        """<script type="text/javascript">var s = "<p>trap</p>";</script>""" +
        """<style>p > a { color: #fff; }</style></head>""" +
        """<body><!-- id=7 --><h1>Doc &amp; 7</h1>""" +
        """<p>body &lt;text&gt; here</p>""" +
        """<div>tail &#65;&#x42; <a href="q?a>b">link</a><br>end</div>""" +
        """</body></html>"""
    x(html) shouldBe
      "Doc 7\nDoc & 7\nbody <text> here\ntail AB link\nend"
  }

  test("entity round-trip: escape then extract returns the original") {
    val texts = Seq("a & b < c > d", "x&amp;y", "&#65; literal",
      "quotes \" and '", "plain", "multi  space\ttab")
    texts.foreach { t =>
      val esc = t.replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;")
      val collapsed = t.replaceAll("[ \t\n\f\r]+", " ").trim
      x(s"<p>$esc</p>") shouldBe collapsed
    }
  }

  private def lk(html: String): Seq[String] = HtmlText.links(html).toSeq

  test("links: quoted/unquoted hrefs, attribute order, case") {
    lk("""<a href="http://a.test/1">x</a>""") shouldBe Seq("http://a.test/1")
    lk("""<a href='http://a.test/2'>x</a>""") shouldBe Seq("http://a.test/2")
    lk("""<a href=http://a.test/3>x</a>""") shouldBe Seq("http://a.test/3")
    lk("""<a class="c" id=z href="u">x</a>""") shouldBe Seq("u")
    lk("""<A HREF="U">x</A>""") shouldBe Seq("U")
    lk("""<a href="q?a>b">x</a>""") shouldBe Seq("q?a>b")
    // first href wins; anchors without href contribute nothing
    lk("""<a href="one" href="two">x</a>""") shouldBe Seq("one")
    lk("""<a name="n">x</a><a>y</a>""") shouldBe Seq.empty
    // document order across anchors
    lk("""<a href="1"></a><p><a href="2"></a></p>""") shouldBe Seq("1", "2")
    // relative links pass through unresolved
    lk("""<a href="/rel/path">x</a>""") shouldBe Seq("/rel/path")
  }

  test("links: entity decode; elided regions mint nothing") {
    lk("""<a href="u?a=1&amp;b=2">x</a>""") shouldBe Seq("u?a=1&b=2")
    lk("""<a href="u?a&#61;1">x</a>""") shouldBe Seq("u?a=1")
    lk("""<script>var s = '<a href="http://trap.test/">t</a>';</script>
         |<!-- <a href="http://comment.test/">c</a> -->
         |<a href="http://real.test/">r</a>""".stripMargin) shouldBe
      Seq("http://real.test/")
    // <abbr>/<area> etc. are not anchors; names starting with 'a' must
    // not false-match
    lk("""<abbr href="not-a-link">x</abbr><a href="yes">y</a>""") shouldBe
      Seq("yes")
  }

  test("links Column face equals the JVM call; null-safe") {
    val df = Seq(
      """<a href="1"></a><a href="2"></a>""",
      "<p>no links</p>",
      null: String).toDF("h")
      .select(HtmlToTextFunctions.htmlLinks(col("h")).as("l"))
    df.as[Seq[String]].collect().toSeq shouldBe
      Seq(Seq("1", "2"), Seq.empty, null)
  }

  test("Column face (codegen) equals the JVM call; plan is map-side") {
    val df = Seq(
      "<p>one</p><p>two</p>",
      "<script>x</script>a &amp; b",
      null: String).toDF("h")
      .select(HtmlToTextFunctions.htmlToText(col("h")).as("t"))
    df.as[String].collect().toSeq shouldBe
      Seq("one\ntwo", "a & b", null)
    val plan = spark.range(4)
      .select(HtmlToTextFunctions.htmlToText(
        concat(lit("<p>x"), col("id").cast("string")))
        .as("t"))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should include("*(1) Project")
  }
}
