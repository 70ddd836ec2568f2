package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization: variant collapse, tracking-param filtering,
  * order-insensitive query keys, and suffix-aware registered domains.
  */
class UrlOpsSpec extends SparkSpec {

  private def norm(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(UrlOps.normalizeUrl(col("url")))
      .collect().map(_.getString(0)).toSeq
  }

  private def dom(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(UrlOps.registeredDomain(col("url")))
      .collect().map(_.getString(0)).toSeq
  }

  test("scheme / www / fragment / trailing-slash variants collapse") {
    val out = norm(
      "https://www.Example.com/a/b",
      "http://example.com/a/b/",
      "https://example.com/a/b#section-2",
      "example.com/a/b")
    out.distinct shouldBe Seq("example.com/a/b")
  }

  test("tracking params drop, surviving params sort (order-insensitive key)") {
    val out = norm(
      "https://example.com/p?id=7&utm_source=feed&lang=en",
      "https://example.com/p?lang=en&id=7&gclid=abc",
      "https://example.com/p?utm_medium=x&id=7&lang=en&fbclid=z&ref=tw")
    out.distinct shouldBe Seq("example.com/p?id=7&lang=en")
  }

  test("userinfo and default ports collapse; non-default ports stay") {
    norm("https://user:pw@example.com:443/a",
         "http://example.com:80/a",
         "https://example.com/a").distinct shouldBe Seq("example.com/a")
    norm("https://example.com:8443/a").head shouldBe "example.com:8443/a"
    dom("https://user@news.example.com:8080/x") shouldBe Seq("example.com")
  }

  test("all-tracking query collapses to no query; bare root path drops") {
    norm("https://example.com/p?utm_source=a&utm_medium=b")
      .head shouldBe "example.com/p"
    norm("https://example.com/").head shouldBe "example.com"
    norm("https://example.com").head shouldBe "example.com"
  }

  test("a 'ref'-PREFIXED param is not the tracking param 'ref'") {
    // referrer=x must survive; ref=x must drop
    norm("https://example.com/p?referrer=x&ref=y")
      .head shouldBe "example.com/p?referrer=x"
  }

  test("registered domain: naive 2-label, multi-label suffixes, short hosts") {
    dom("https://www.news.example.com/x") shouldBe Seq("example.com")
    dom("http://a.b.example.co.uk/x") shouldBe Seq("example.co.uk")
    dom("https://example.co.jp") shouldBe Seq("example.co.jp")
    dom("http://localhost/x") shouldBe Seq("localhost")
    dom("https://Example.COM/x") shouldBe Seq("example.com")
  }

  test("q129 gate: variants actually dedup (n_unique < n_urls everywhere)") {
    val rows = graft.queries.ExtensionQueries.q129UrlDedup(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[Long]("n_unique") should be < r.getAs[Long]("n_urls")
      // TLD alternates on doc_id % 3, coprime with the source stride,
      // so every source sees both registered domains
      r.getAs[Long]("n_domains") shouldBe 2L
    }
  }
}
