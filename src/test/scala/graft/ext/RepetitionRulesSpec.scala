package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RepetitionRulesSpec extends SparkSpec {
  import spark.implicits._

  private def repStats(text: String, n: Int): (Long, Long, Long, Long) =
    Seq(text).toDF("t")
      .select(graft.functions.GramFunctions.gramRepStats(col("t"), n).as("s"))
      .select(col("s.total_grams"), col("s.distinct_grams"),
        col("s.top_gram_chars"), col("s.dup_gram_chars"))
      .as[(Long, Long, Long, Long)].head()

  test("gram_rep_stats: totals, distincts, top and dup coverage") {
    // bigrams of "a b a b c": a_b, b_a, a_b, b_c
    repStats("a b a b c", 2) shouldBe ((4L, 3L, 2L * 3, 2L * 3))
  }

  test("gram_rep_stats: count ties resolve to the longest gram") {
    // ab_cd and efg_hij both occur twice; top must be 2*len("efg_hij")
    repStats("ab cd ab cd efg hij efg hij", 2) match {
      case (total, distinct, top, dup) =>
        total shouldBe 7L
        distinct shouldBe 5L
        top shouldBe 2L * 7
        dup shouldBe 2L * 5 + 2L * 7
    }
  }

  test("gram_rep_stats: fewer tokens than n yields all zeros") {
    repStats("one two", 5) shouldBe ((0L, 0L, 0L, 0L))
  }

  test("gram_rep_stats: all-unique grams still report top coverage") {
    // most frequent gram has count 1; coverage = its length
    repStats("aa bbb c", 2) shouldBe ((2L, 2L, 6L, 0L))
  }

  private def battery(text: String) =
    RepetitionRules.battery(Seq((1L, text)).toDF("doc_id", "text"))

  private def flag(text: String, rule: String): Boolean =
    battery(text).select(col(rule)).as[Boolean].head()

  test("duplicate-line rules fire on a line-repetition doc and stay " +
    "quiet on a clean one") {
    val dirty = "head fragment" + ("\nthe same line" * 7)
    flag(dirty, "r_dup_lines") shouldBe false
    flag(dirty, "r_dup_line_chars") shouldBe false
    val clean = "alpha\nbeta\ngamma\ndelta"
    flag(clean, "r_dup_lines") shouldBe true
    flag(clean, "r_dup_line_chars") shouldBe true
  }

  test("duplicate-line count threshold is a closed bound (== 0.30 passes)") {
    // 10 lines, 3 duplicates: 3*10 <= 10*3 — keep; 4 duplicates — drop
    val sevenDistinct = (1 to 7).map(i => s"line$i").mkString("\n")
    flag(sevenDistinct + "\nline1\nline2\nline3", "r_dup_lines") shouldBe true
    flag((1 to 6).map(i => s"line$i").mkString("\n") +
      "\nline1\nline2\nline3\nline4", "r_dup_lines") shouldBe false
  }

  test("duplicate-paragraph rules fire on paragraph boilerplate") {
    val dirty = "unique head paragraph" + ("\n\nsame paragraph block" * 5)
    flag(dirty, "r_dup_paras") shouldBe false
    flag(dirty, "r_dup_para_chars") shouldBe false
    flag("one paragraph\n\nanother paragraph", "r_dup_paras") shouldBe true
  }

  test("top-bigram coverage fires on a dominant bigram run") {
    val dirty = "short head" + (" alpha beta" * 30)
    flag(dirty, "r_top2gram") shouldBe false
    // a long varied doc passes
    val clean = (1 to 60).map(i => s"w$i").mkString(" ")
    flag(clean, "r_top2gram") shouldBe true
  }

  test("duplicated-5-gram coverage fires on a twice-repeated sentence") {
    val s = " zeta eta theta iota kappa lambda mu nu xi omicron pi rho"
    val dirty = "head words here" + (s * 2)
    flag(dirty, "r_dup5gram") shouldBe false
    flag(dirty, "r_dup10gram") shouldBe false
    val clean = (1 to 40).map(i => s"w$i").mkString(" ")
    flag(clean, "r_dup5gram") shouldBe true
  }

  test("keep is the conjunction of all thirteen rules") {
    val got = battery((1 to 40).map(i => s"tok$i").mkString(" "))
      .select(RepetitionRules.RuleCols.map(col) :+ col("keep"): _*)
      .collect().head
    (0 until got.length).foreach(i => got.getBoolean(i) shouldBe true)
    RepetitionRules.RuleCols.size shouldBe 13
  }

  test("empty text keeps (no repetition mass, zero denominators hold)") {
    flag("", "r_dup_lines") shouldBe true
    battery("").select(col("keep")).as[Boolean].head() shouldBe true
  }

  test("the battery is a pure map-side scan — no exchange in the plan") {
    val plan = battery("a b c").queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
