package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Gopher/C4 rule battery: each rule isolated on a crafted
  * document, exact threshold boundaries (integer cross-multiplication,
  * closed bounds), and the map-side plan contract.
  */
class QualityRulesSpec extends SparkSpec {

  private def run(texts: (String, String)*) = {
    import spark.implicits._
    QualityRules.battery(texts.toSeq.toDF("name", "text"))
      .collect().map(r => r.getAs[String]("name") -> r).toMap
  }

  // a clean 60-word document that passes every rule
  private val clean: String =
    (Seq("the", "quick", "brown", "fox", "jumps", "of") ++
      Seq.fill(53)("word") :+ "end").mkString(" ")

  test("a clean document passes all nine rules") {
    val r = run("clean" -> clean)("clean")
    QualityRules.RuleCols.foreach(c =>
      withClue(c) { r.getAs[Boolean](c) shouldBe true })
    r.getAs[Boolean]("keep") shouldBe true
  }

  test("each dirty document fails its targeted rule (and never keeps)") {
    val out = run(
      "short" -> "too few words here",
      "long_words" -> Seq.fill(60)("pneumonoultramicro").mkString(" "),
      "symbols" -> (clean + " " + Seq.fill(10)("#").mkString(" ")),
      "bullets" -> (Seq.fill(10)("- " + clean).mkString("\n")),
      "ellipsis" -> (clean + "\nwait ...\nmore ...\nyet ..."),
      "numeric" -> (Seq.fill(30)("123") ++ clean.split(" ").take(30)).mkString(" "),
      "no_stops" -> Seq.fill(60)("word").mkString(" "),
      "brace" -> (clean + " {x}"),
      "lorem" -> (clean + " Lorem Ipsum filler"))
    out("short").getAs[Boolean]("r_word_count") shouldBe false
    out("long_words").getAs[Boolean]("r_mean_word_len") shouldBe false
    out("symbols").getAs[Boolean]("r_symbol_ratio") shouldBe false
    out("bullets").getAs[Boolean]("r_bullet_lines") shouldBe false
    out("ellipsis").getAs[Boolean]("r_ellipsis_lines") shouldBe false
    out("numeric").getAs[Boolean]("r_alpha_words") shouldBe false
    out("no_stops").getAs[Boolean]("r_stopwords") shouldBe false
    out("brace").getAs[Boolean]("r_no_brace") shouldBe false
    out("lorem").getAs[Boolean]("r_no_lorem") shouldBe false
    // ...and none of them slips through the composite
    out.values.foreach(_.getAs[Boolean]("keep") shouldBe false)
  }

  test("thresholds are closed bounds — the exact boundary passes") {
    // 50 words of mean length exactly 3 (and exactly 10): in bounds.
    // symbol ratio exactly 0.1: 5 symbols in 50 words passes, 6 fails.
    val w50m3 = (Seq("the", "and") ++ Seq.fill(48)("cat")).mkString(" ")
    val w50m10 = (Seq("theodorean", "apodeictic") ++
      Seq.fill(48)("abcdefghij")).mkString(" ")
    val sym5 = (Seq("the", "and") ++ Seq.fill(43)("cat") ++
      Seq.fill(5)("#")).mkString(" ")
    val sym6 = (Seq("the", "and") ++ Seq.fill(42)("cat") ++
      Seq.fill(6)("#")).mkString(" ")
    val out = run("m3" -> w50m3, "m10" -> w50m10,
      "sym5" -> sym5, "sym6" -> sym6)
    out("m3").getAs[Boolean]("r_mean_word_len") shouldBe true
    out("m10").getAs[Boolean]("r_mean_word_len") shouldBe true
    out("m3").getAs[Boolean]("r_word_count") shouldBe true
    out("sym5").getAs[Boolean]("r_symbol_ratio") shouldBe true
    out("sym6").getAs[Boolean]("r_symbol_ratio") shouldBe false
  }

  test("bullet fraction boundary: 9 of 10 lines passes, 10 of 10 fails") {
    val pass = (Seq.fill(9)("- x") :+ "plain line").mkString("\n")
    val fail = Seq.fill(10)("- x").mkString("\n")
    val out = run("pass" -> pass, "fail" -> fail)
    out("pass").getAs[Boolean]("r_bullet_lines") shouldBe true
    out("fail").getAs[Boolean]("r_bullet_lines") shouldBe false
  }

  test("the battery is map-side: no exchange in the plan") {
    import spark.implicits._
    val plan = QualityRules.battery(Seq(("a", clean)).toDF("name", "text"))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("q125 gate populates every rule's failure column") {
    val out = graft.queries.ExtensionQueries.q125QualityRules(spark, sf)
    val agg = out.agg(
        sum(col("f_symbol_ratio")), sum(col("f_bullet_lines")),
        sum(col("f_ellipsis_lines")), sum(col("f_no_brace")),
        sum(col("f_no_lorem")), sum(col("f_word_count")),
        sum(col("n_keep")), sum(col("n_docs")))
      .collect().head
    // injected dirt guarantees the line/boiler rules fire; organic
    // shortness guarantees word-count failures; and the filter must
    // not be degenerate (some docs keep, some drop)
    (0 to 5).foreach(i => withClue(s"col $i") { agg.getLong(i) should be > 0L })
    agg.getLong(6) should be > 0L
    agg.getLong(6) should be < agg.getLong(7)
  }
}
