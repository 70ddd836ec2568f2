package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Flatten/unflatten round-trip (`nested_dicts.py:121-226` semantics):
  * dot-path naming, depth recursion, order preservation.
  */
class NestedPathsSpec extends SparkSpec {
  import spark.implicits._

  private def nested = Seq((1, (2, (3.5, "x")), "top")).toDF("id", "m", "tag")
    .select(col("id"),
      struct(col("m._1").as("a"),
        struct(col("m._2._1").as("b"), col("m._2._2").as("c")).as("inner"))
        .as("m"),
      col("tag"))

  test("flatten produces dot-named leaf columns in schema order") {
    val flat = NestedPaths.flatten(nested)
    flat.columns.toSeq shouldBe Seq("id", "m.a", "m.inner.b", "m.inner.c", "tag")
    flat.collect().head.toSeq shouldBe Seq(1, 2, 3.5, "x", "top")
  }

  test("unflatten(flatten(df)) restores the nested schema") {
    val round = NestedPaths.unflatten(NestedPaths.flatten(nested))
    round.schema shouldBe nested.schema
    round.collect() shouldBe nested.collect()
  }

  test("leafPaths lists depth-first dot paths") {
    NestedPaths.leafPaths(nested.schema) shouldBe
      Seq("id", "m.a", "m.inner.b", "m.inner.c", "tag")
  }
}
