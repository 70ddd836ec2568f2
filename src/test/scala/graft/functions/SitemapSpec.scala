package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The tolerant sitemap scanner ([[Sitemap]]): real-web grammar
  * (namespaces, comments, CDATA, entities, whitespace, truncation)
  * against hand-written documents, plus the codegen Column face.
  */
class SitemapSpec extends SparkSpec {

  import spark.implicits._

  private def locs(xml: String): Seq[String] =
    Sitemap.entries(xml).map(_.loc).toSeq

  test("urlset: loc/lastmod/priority, whitespace trim, document order") {
    val e = Sitemap.entries(
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        | <url><loc>http://a.test/1</loc><lastmod>2024-01-15</lastmod>
        |   <priority>0.8</priority></url>
        | <url><loc>
        |    http://a.test/2
        | </loc></url>
        |</urlset>""".stripMargin)
    e.toSeq shouldBe Seq(
      Sitemap.Entry("url", "http://a.test/1", "2024-01-15", "0.8"),
      Sitemap.Entry("url", "http://a.test/2", "", ""))
  }

  test("sitemapindex entries carry kind=sitemap") {
    Sitemap.entries(
      "<sitemapindex><sitemap><loc>http://a.test/s1.xml</loc>" +
        "<lastmod>2023-12-31</lastmod></sitemap>" +
        "<sitemap><loc>http://a.test/s2.xml</loc></sitemap>" +
        "</sitemapindex>").toSeq shouldBe Seq(
      Sitemap.Entry("sitemap", "http://a.test/s1.xml", "2023-12-31", ""),
      Sitemap.Entry("sitemap", "http://a.test/s2.xml", "", ""))
  }

  test("entities decode; CDATA is verbatim; comments elide") {
    locs("<urlset><url><loc>http://a.test/q?a=1&amp;b=2</loc></url>" +
      "<url><loc><![CDATA[http://a.test/cd?x=<&>]]></loc></url>" +
      "<url><loc>http://a.test/<!-- not this -->real</loc></url>" +
      "</urlset>") shouldBe Seq(
      "http://a.test/q?a=1&b=2", "http://a.test/cd?x=<&>",
      "http://a.test/real")
    // numeric refs, hex and decimal; malformed refs pass through
    locs("<urlset><url><loc>http://a.test/&#x41;&#66;&#bad;</loc></url>" +
      "</urlset>") shouldBe Seq("http://a.test/AB&#bad;")
    // CDATA is VERBATIM even when it contains entity-shaped text —
    // that protection is what CDATA is for; mixed ordinary runs
    // around it still decode
    locs("<urlset><url><loc>&#47;<![CDATA[x&amp;y]]>&#47;</loc></url>" +
      "</urlset>") shouldBe Seq("/x&amp;y/")
  }

  test("quoted attribute values may contain '>'") {
    locs("<urlset><url><loc foo=\"a>b\">http://a.test/1</loc></url>" +
      "<url zz='q>r'><loc>http://a.test/2</loc></url></urlset>"
    ) shouldBe Seq("http://a.test/1", "http://a.test/2")
  }

  test("namespace prefixes match by local name; unknown elements skip") {
    locs("<sm:urlset xmlns:sm=\"x\"><sm:url><sm:loc>http://a.test/p" +
      "</sm:loc><video:title>v</video:title></sm:url></sm:urlset>"
    ) shouldBe Seq("http://a.test/p")
  }

  test("missing loc drops the entry; repeated children are first-wins") {
    Sitemap.entries(
      "<urlset><url><lastmod>2024-01-01</lastmod></url>" +
        "<url><loc>http://a.test/1</loc><loc>http://a.test/IGNORED</loc>" +
        "<lastmod>2024-02-02</lastmod><lastmod>2024-03-03</lastmod></url>" +
        "</urlset>").toSeq shouldBe Seq(
      Sitemap.Entry("url", "http://a.test/1", "2024-02-02", ""))
  }

  test("truncation and missing close tags are tolerated") {
    // file cut off mid-entry: the open entry still emits
    locs("<urlset><url><loc>http://a.test/1</loc></url>" +
      "<url><loc>http://a.test/2</loc>") shouldBe
      Seq("http://a.test/1", "http://a.test/2")
    // a new <url> open with no prior close finalizes the previous
    locs("<urlset><url><loc>http://a.test/1</loc>" +
      "<url><loc>http://a.test/2</loc></url></urlset>") shouldBe
      Seq("http://a.test/1", "http://a.test/2")
  }

  test("Column face (codegen) equals the JVM call; null-safe") {
    val xml = "<urlset><url><loc>http://a.test/1</loc>" +
      "<lastmod>2024-01-15</lastmod></url></urlset>"
    val df = Seq(Some(xml), None).toDF("xml")
      .select(SitemapFunctions.sitemapEntries(col("xml")).as("e"))
    val rows = df.collect()
    rows(0).getSeq[org.apache.spark.sql.Row](0).map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
    ) shouldBe Seq(("url", "http://a.test/1", "2024-01-15", ""))
    rows(1).isNullAt(0) shouldBe true
  }
}
