package graft.ops

import graft.SparkSpec
import graft.ops.Selectors._
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Mirrors the reference's selector matrix
  * (`deprecated/test_get_data_from_selectors.py:59-100`):
  * exact / glob / regex / substring / list classification and matching.
  */
class SelectorsSpec extends SparkSpec {
  import spark.implicits._

  test("parse classifies like the reference backend") {
    parse("re:^ab.*") shouldBe Re("^ab.*")
    parse("in:bc") shouldBe Substr("bc")
    parse("a*c") shouldBe Glob("a*c")
    parse("a?c") shouldBe Glob("a?c")
    parse("a[bc]d") shouldBe Glob("a[bc]d")
    parse("plain") shouldBe Exact("plain")
  }

  private def names = Seq("alpha", "beta", "alphabet", "gamma", "ALPHA")
    .toDF("name")

  private def matching(sel: String): Seq[String] =
    names.filter(toColumn(col("name"), sel))
      .as[String].collect().toSeq.sorted

  test("exact") { matching("alpha") shouldBe Seq("alpha") }
  test("substring (in:)") { matching("in:phab") shouldBe Seq("alphabet") }
  test("regex (re:) is unanchored search") {
    matching("re:ph") shouldBe Seq("alpha", "alphabet")
  }
  test("glob is full-match, like fnmatch") {
    matching("alp*") shouldBe Seq("alpha", "alphabet")
    matching("*eta") shouldBe Seq("beta")
    matching("?eta") shouldBe Seq("beta")
    matching("gamm[ab]") shouldBe Seq("gamma")
    matching("gamm[!c]") shouldBe Seq("gamma")
  }
  test("list membership") {
    names.filter(toColumn(col("name"), OneOf(Seq("beta", "gamma"))))
      .as[String].collect().toSeq.sorted shouldBe Seq("beta", "gamma")
  }

  test("globToRegex escapes regex metacharacters") {
    globToRegex("a.b") shouldBe "^a\\.b$"
    globToRegex("a+b*") shouldBe "^a\\+b.*$"
    "x(1)".matches(globToRegex("x(1)")) shouldBe true
  }

  test("property: literal strings glob-match only themselves") {
    val lit = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val pairs = Gen.listOfN(200, Gen.zip(lit, lit))
      .apply(Gen.Parameters.default, Seed(42L)).get
    pairs.foreach { case (a, b) =>
      withClue(s"glob '$a' vs '$b': ") {
        a.matches(globToRegex(a)) shouldBe true
        if (a != b) b.matches(globToRegex(a)) shouldBe false
      }
    }
  }
}
