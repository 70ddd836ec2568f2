package graft.ops

import graft.SparkSpec
import graft.ops.ConditionFilter._
import org.apache.spark.sql.functions._

/** Mirrors the reference's filter matrix (`test/test_df_helpers.py:19-91`):
  * exact / membership / None-as-null / callable / or-combine / error cases.
  */
class ConditionFilterSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(1), Some("a"), Some(10.0)),
    (Some(2), Some("b"), None),
    (Some(3), None,      Some(30.0)),
    (Some(4), Some("a"), Some(40.0))
  ).toDF("id", "tag", "v")

  test("scalar equality") {
    ConditionFilter(df, Map("tag" -> Eq("a")))
      .select("id").as[Int].collect().sorted shouldBe Array(1, 4)
  }

  test("membership") {
    ConditionFilter(df, Map("id" -> In(Seq(2, 3))))
      .select("id").as[Int].collect().sorted shouldBe Array(2, 3)
  }

  test("null condition means is-null (reference df_helpers.py:54-55)") {
    ConditionFilter(df, Map("tag" -> IsNull))
      .select("id").as[Int].collect() shouldBe Array(3)
  }

  test("callable predicate") {
    ConditionFilter(df, Map("v" -> Pred(_ > 15.0)))
      .select("id").as[Int].collect().sorted shouldBe Array(3, 4)
  }

  test("and-combine is default; null comparisons drop rows (fillna(False))") {
    ConditionFilter(df, Map("tag" -> Eq("a"), "v" -> Pred(_ > 15.0)))
      .select("id").as[Int].collect() shouldBe Array(4)
    // row 2 (v=null) must not satisfy v>5 — pandas fillna(False) parity
    ConditionFilter(df, Map("v" -> Pred(_ > 5.0)))
      .select("id").as[Int].collect().sorted shouldBe Array(1, 3, 4)
  }

  test("or-combine") {
    ConditionFilter(df, Map("tag" -> IsNull, "id" -> Eq(1)), Or)
      .select("id").as[Int].collect().sorted shouldBe Array(1, 3)
  }

  test("unknown column raises, like the reference's validation") {
    an[IllegalArgumentException] should be thrownBy
      ConditionFilter(df, Map("nope" -> Eq(1)))
  }

  test("empty condition map raises") {
    an[IllegalArgumentException] should be thrownBy
      ConditionFilter(df, Map.empty)
  }
}
