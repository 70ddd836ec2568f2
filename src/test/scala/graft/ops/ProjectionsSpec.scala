package graft.ops

import graft.SparkSpec

/** Mirrors the reference's prepend/projection matrix
  * (`test/test_df_helpers.py:94-168`): constant prepend, collision
  * overwrite, front ordering, sequence prepend, length validation.
  */
class ProjectionsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1, "x"), (2, "y")).toDF("id", "tag")

  test("project validates unknown columns") {
    Projections.project(df, Seq("tag")).columns shouldBe Array("tag")
    an[IllegalArgumentException] should be thrownBy
      Projections.project(df, Seq("missing"))
  }

  test("prependLit adds constants at the front, declaration order") {
    val out = Projections.prependLit(df, Seq("case" -> "c1", "run" -> 7))
    out.columns shouldBe Array("case", "run", "id", "tag")
    out.select("case", "run").distinct().collect()
      .map(r => (r.getString(0), r.getInt(1))) shouldBe Array(("c1", 7))
  }

  test("prependLit overwrites colliding columns and moves them front") {
    val out = Projections.prependLit(df, Seq("tag" -> "forced"))
    out.columns shouldBe Array("tag", "id")
    out.select("tag").distinct().as[String].collect() shouldBe Array("forced")
  }

  test("prependLit rejects duplicate names") {
    an[IllegalArgumentException] should be thrownBy
      Projections.prependLit(df, Seq("a" -> 1, "a" -> 2))
  }

  test("prependSeq overwrites a colliding column without ambiguity") {
    val out = Projections.prependSeq(df, "tag", Seq("a", "b"), Seq("id"))
    out.columns shouldBe Array("tag", "id")
    out.orderBy("id").select("tag").as[String].collect() shouldBe Array("a", "b")
  }

  test("prependSeq preserves numeric types") {
    val out = Projections.prependSeq(df, "score", Seq(1.5, 2.5), Seq("id"))
    out.schema("score").dataType shouldBe org.apache.spark.sql.types.DoubleType
    out.orderBy("id").select("score").as[Double].collect() shouldBe Array(1.5, 2.5)
  }

  test("prependSeq joins by explicit order and validates length") {
    val out = Projections.prependSeq(df, "label", Seq("first", "second"), Seq("id"))
    out.columns shouldBe Array("label", "id", "tag")
    out.orderBy("id").select("label").as[String].collect() shouldBe
      Array("first", "second")
    an[IllegalArgumentException] should be thrownBy
      Projections.prependSeq(df, "label", Seq("only-one"), Seq("id"))
  }
}
