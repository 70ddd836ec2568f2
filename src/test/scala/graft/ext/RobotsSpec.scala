package graft.ext

import graft.SparkSpec
import graft.functions.RobotsRules
import org.apache.spark.sql.functions._

/** Hand-computed battery for the robots.txt parser
  * ([[graft.functions.RobotsRules]]) and the allow/disallow election
  * ([[Robots.withAllowed]]).
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def rules(txt: String, agent: String = "graftbot") =
    RobotsRules.rulesFor(txt, agent).toSeq

  test("groups, comments, case-insensitive fields and agents") {
    val txt =
      """# banner comment
        |User-agent: OtherBot
        |Disallow: /
        |
        |User-Agent: GraftBot  # trailing comment
        |DISALLOW: /private
        |allow: /private/ok
        |
        |User-agent: *
        |Disallow: /fallback
        |""".stripMargin
    rules(txt) shouldBe Seq(false -> "/private", true -> "/private/ok")
    // unknown agent falls back to the * group
    rules(txt, "nobody") shouldBe Seq(false -> "/fallback")
  }

  test("consecutive UA lines share a group; UA after rules starts one") {
    val txt =
      """User-agent: a
        |User-agent: graftbot
        |Disallow: /x
        |User-agent: b
        |Disallow: /y
        |""".stripMargin
    rules(txt) shouldBe Seq(false -> "/x")
    rules(txt, "b") shouldBe Seq(false -> "/y")
    // 'a' shares the first group
    rules(txt, "a") shouldBe Seq(false -> "/x")
  }

  test("multiple groups for the same agent combine (RFC)") {
    val txt =
      """User-agent: graftbot
        |Disallow: /x
        |User-agent: graftbot
        |Allow: /x/ok
        |""".stripMargin
    rules(txt) shouldBe Seq(false -> "/x", true -> "/x/ok")
  }

  test("empty values are no-restriction; stray rules are ignored") {
    val txt =
      """Disallow: /orphan
        |User-agent: graftbot
        |Disallow:
        |Allow:
        |Disallow: /real
        |Crawl-delay: 10
        |Sitemap: http://x/s.xml
        |""".stripMargin
    rules(txt) shouldBe Seq(false -> "/real")
    // no group at all → no rules
    rules("just text, no fields") shouldBe Seq.empty
  }

  test("sitemaps are group-independent; crawl-delay follows group selection") {
    val txt =
      """Sitemap: http://x.test/top.xml
        |User-agent: otherbot
        |Crawl-delay: 1
        |Disallow: /
        |Sitemap: http://x.test/inner.xml
        |User-agent: graftbot
        |Crawl-delay: 7
        |Disallow: /a
        |User-agent: graftbot
        |Crawl-delay: 3
        |Disallow: /b
        |User-agent: *
        |Crawl-delay: 9
        |Disallow: /c
        |""".stripMargin
    RobotsRules.sitemaps(txt).toSeq shouldBe
      Seq("http://x.test/top.xml", "http://x.test/inner.xml")
    // both graftbot groups match; the smaller delay wins
    RobotsRules.crawlDelay(txt, "graftbot") shouldBe Some(3L)
    // unknown agent → the * group
    RobotsRules.crawlDelay(txt, "nobody") shouldBe Some(9L)
    // garbage / negative values are skipped
    RobotsRules.crawlDelay(
      "User-agent: graftbot\nCrawl-delay: x\n", "graftbot") shouldBe None
    RobotsRules.crawlDelay("no groups here", "graftbot") shouldBe None
  }

  test("Crawl-delay between UA lines does not split the group (shared grammar)") {
    // the two passes (rulesFor, crawlDelay) must agree on group
    // membership: Crawl-delay is NOT a rule line, so a User-agent
    // after it JOINS the open group in BOTH passes
    val txt =
      """User-agent: aaa
        |Crawl-delay: 5
        |User-agent: bbb
        |Disallow: /x
        |""".stripMargin
    rules(txt, "aaa") shouldBe Seq(false -> "/x")
    rules(txt, "bbb") shouldBe Seq(false -> "/x")
    RobotsRules.crawlDelay(txt, "aaa") shouldBe Some(5L)
    RobotsRules.crawlDelay(txt, "bbb") shouldBe Some(5L)
    // after rules it DOES belong to the closed group, and the next
    // User-agent starts a new one — in both passes
    val txt2 =
      """User-agent: aaa
        |Disallow: /x
        |Crawl-delay: 4
        |User-agent: bbb
        |Disallow: /y
        |""".stripMargin
    rules(txt2, "aaa") shouldBe Seq(false -> "/x")
    rules(txt2, "bbb") shouldBe Seq(false -> "/y")
    RobotsRules.crawlDelay(txt2, "aaa") shouldBe Some(4L)
    RobotsRules.crawlDelay(txt2, "bbb") shouldBe None
  }

  test("election: longest prefix wins, Allow wins ties, default allow") {
    val rulesDf = Seq(
      ("h.test", false, "/private"),
      ("h.test", true, "/private/ok"),
      ("h.test", false, "/dup"),
      ("h.test", true, "/dup"),          // length tie → Allow wins
      ("other.test", false, "/")).toDF("host", "allow", "prefix")
    val urls = Seq(
      (1L, "h.test", "/private/ok/a"),   // allow (longest)
      (2L, "h.test", "/private/x"),      // disallow
      (3L, "h.test", "/dup/z"),          // allow (tie)
      (4L, "h.test", "/free"),           // no match → allow
      (5L, "other.test", "/anything"))   // disallowed by /
      .toDF("doc_id", "host", "path")
    val out = Robots.withAllowed(urls, rulesDf, Seq("doc_id"))
      .select(col("doc_id"), col("allowed"))
      .as[(Long, Boolean)].collect().toMap
    out shouldBe Map(1L -> true, 2L -> false, 3L -> true,
      4L -> true, 5L -> false)
  }

  test("repMatches: RFC 9309 wildcard grammar") {
    import RobotsRules.repMatches
    // plain patterns are prefix rules
    repMatches("/private/x", "/private") shouldBe true
    repMatches("/privacy", "/private") shouldBe false
    // '*' matches any run, empty included
    repMatches("/a/b.php", "/*.php") shouldBe true
    repMatches("/a.php/b", "/*.php") shouldBe true     // prefix semantics
    repMatches("/files/x/public", "/files/*/public") shouldBe true
    repMatches("/files/public", "/files/*public") shouldBe true // empty run
    repMatches("/files/x/private", "/files/*/public") shouldBe false
    // trailing '$' anchors to the path end
    repMatches("/a/b.php", "/*.php$") shouldBe true
    repMatches("/a/b.php5", "/*.php$") shouldBe false
    repMatches("/dl", "/dl$") shouldBe true
    repMatches("/dl/x", "/dl$") shouldBe false
    // multiple stars, in-order chunk placement
    repMatches("/a/xx/b/yy/c", "/a/*/b/*/c") shouldBe true
    repMatches("/a/xx/c/yy/b", "/a/*/b/*/c") shouldBe false
    // '*$' anchors trivially (the star eats the tail)
    repMatches("/p2/anything", "/p2*$") shouldBe true
    // a lone anchored root
    repMatches("/", "/$") shouldBe true
    repMatches("/x", "/$") shouldBe false
  }

  test("repMatches: UTF8String face equals the String face (property sweep)") {
    // the codegen hot path runs the allocation-free byte-level overload
    // (r21); this pins it to the String reference implementation over a
    // randomized grammar sweep including multi-byte UTF-8 and edge shapes
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(7)
    val atoms = Seq("/", "a", "bb", ".php", "é", "世", "p2", "x/y", "$", "")
    def rand(maxParts: Int, starWeight: Double): String =
      (0 until (1 + rnd.nextInt(maxParts))).map { _ =>
        if (rnd.nextDouble() < starWeight) "*"
        else atoms(rnd.nextInt(atoms.size))
      }.mkString
    val fixed = Seq(
      ("/private/x", "/private"), ("/a/b.php", "/*.php$"),
      ("/", "/$"), ("/x", "/$"), ("", ""), ("", "*"), ("/a", ""),
      ("/aé世b", "/a*b$"), ("/aé世b", "/a*世*"), ("é", "é$"),
      ("/p2/x", "/p2*$"), ("/a", "**"), ("/a", "*$"), ("", "$"))
    val cases = fixed ++ (0 until 4000).map(_ =>
      (rand(6, 0.0).replace("*", "x"), rand(5, 0.35)))
    cases.foreach { case (path, pattern) =>
      withClue(s"path='$path' pattern='$pattern': ") {
        RobotsRules.repMatches(
          UTF8String.fromString(path), UTF8String.fromString(pattern)) shouldBe
          RobotsRules.repMatches(path, pattern)
      }
    }
  }

  test("pattern election: most octets wins, Allow wins ties, default allow") {
    val rulesDf = Seq(
      ("h.test", false, "/*.php$"),          // len 7
      ("h.test", true, "/files/*/public"),   // len 15
      ("h.test", false, "/private"),         // plain prefix, len 8
      ("h.test", false, "/dl$")).toDF("host", "allow", "pattern")
    val urls = Seq(
      (1L, "h.test", "/files/9/public/a.php"), // allow 15 beats deny 7
      (2L, "h.test", "/x/page.php"),           // denied by /*.php$
      (3L, "h.test", "/x/page.php5"),          // anchor miss -> allowed
      (4L, "h.test", "/dl"),                   // denied exactly
      (5L, "h.test", "/dl/9"),                 // anchor miss -> allowed
      (6L, "h.test", "/private/x"))            // plain prefix still works
      .toDF("doc_id", "host", "path")
    val out = Robots.withAllowedPatterns(urls, rulesDf, Seq("doc_id"))
      .select(col("doc_id"), col("allowed"))
      .as[(Long, Boolean)].collect().toMap
    out shouldBe Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false, 5L -> true, 6L -> false)
  }

  test("election preserves the URL frame's other columns") {
    val rulesDf = Seq(("h.test", false, "/no")).toDF("host", "allow", "prefix")
    val urls = Seq((1L, "h.test", "/no/x", "payload"))
      .toDF("doc_id", "host", "path", "extra")
    val row = Robots.withAllowed(urls, rulesDf, Seq("doc_id")).collect()(0)
    row.getAs[String]("extra") shouldBe "payload"
    row.getAs[Boolean]("allowed") shouldBe false
  }

  test("expression face: rules ride a (host, txt) frame map-side") {
    val df = Seq(
      ("h1", "User-agent: graftbot\nDisallow: /a\nAllow: /a/b\n"),
      ("h2", "User-agent: *\nDisallow: /c\n"),
      ("h3", null: String)).toDF("host", "txt")
      .select(col("host"),
        graft.functions.RobotsFunctions.robotsRules(col("txt"), "graftbot")
          .as("r"))
    val got = df.collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) null else r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getBoolean(0), x.getString(1))))).toMap
    got("h1") shouldBe Seq(false -> "/a", true -> "/a/b")
    got("h2") shouldBe Seq(false -> "/c")
    got("h3") shouldBe null
    // agent must be a lower-case token
    an[IllegalArgumentException] should be thrownBy
      graft.functions.RobotsFunctions.robotsRules(col("txt"), "GraftBot")
  }

  test("crawl-delay expression face equals the JVM call; absent is null") {
    val cases = Seq(
      ("h1", "User-agent: graftbot\nCrawl-delay: 3\nDisallow: /a\n"),
      ("h2", "User-agent: *\nCrawl-delay: 9\n"),       // * group fallback
      ("h3", "User-agent: graftbot\nDisallow: /a\n"),  // group, no delay
      ("h4", "no groups here"),                        // no group at all
      ("h5", null: String))                            // null text
    val df = cases.toDF("host", "txt")
      .select(col("host"),
        graft.functions.RobotsFunctions.robotsCrawlDelay(col("txt"),
          "graftbot").as("d"))
    val got = df.collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    got("h1") shouldBe Some(3L)
    got("h2") shouldBe Some(9L)
    got("h3") shouldBe None
    got("h4") shouldBe None
    got("h5") shouldBe None
    // the expression IS the JVM selection — including the shared
    // group grammar's smallest-of-matched-groups rule
    cases.collect { case (h, txt) if txt != null =>
      got(h) shouldBe graft.functions.RobotsRules.crawlDelay(txt, "graftbot")
    }
    an[IllegalArgumentException] should be thrownBy
      graft.functions.RobotsFunctions.robotsCrawlDelay(col("txt"), "Graft Bot")
  }
}
