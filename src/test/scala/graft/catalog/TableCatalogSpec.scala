package graft.catalog

import graft.SparkSpec
import graft.ops.ConditionFilter.Eq
import org.apache.spark.sql.functions._

/** Mirrors the reference's in-memory DB flow
  * (`test/test_df_helpers_complex.py:15-101`): write → evolving append →
  * metadata-inferred grouped read; plus key validation and stable ids.
  */
class TableCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("write/append evolves schema and keeps metadata") {
    val cat = new TableCatalog(spark)
    val meta = TableMeta(tableKeys = Seq("case", "station"),
      baseColNames = Seq("load"))
    cat.write("loads", Seq(("c1", 1, 10.0)).toDF("case", "station", "load"), meta)
    cat.write("loads", Seq(("c2", 1, 20.0, "extra"))
      .toDF("case", "station", "load", "note"))
    cat.frame("loads").columns.sorted shouldBe
      Array("case", "load", "note", "station")
    cat.frame("loads").count() shouldBe 2
    cat.meta("loads").tableKeys shouldBe Seq("case", "station")
    // temp view registered
    spark.sql("SELECT count(*) AS n FROM loads").as[Long].collect().head shouldBe 2
  }

  test("declared keys must exist in combined columns (df_helpers.py:287-336)") {
    val cat = new TableCatalog(spark)
    an[IllegalArgumentException] should be thrownBy
      cat.write("bad", Seq((1, 2)).toDF("a", "b"),
        TableMeta(keys = Seq("missing")))
  }

  test("read infers group keys = tableKeys minus filtered keys") {
    val cat = new TableCatalog(spark)
    val meta = TableMeta(tableKeys = Seq("case", "station"),
      baseColNames = Seq("load"))
    cat.write("t", Seq(("c1", 1, 10.0), ("c1", 2, 20.0), ("c2", 1, 30.0))
      .toDF("case", "station", "load"), meta)
    val (df, keys) = cat.read("t", Map("case" -> Eq("c1")))
    keys shouldBe Seq("station")
    df.columns.toSeq shouldBe Seq("station", "load")
    df.count() shouldBe 2
    val agg = cat.readGrouped("t", Map("case" -> Eq("c1")),
      Seq(sum($"load").as("total")))
    agg.orderBy("station").collect().map(_.getDouble(1)) shouldBe
      Array(10.0, 20.0)
  }

  test("stableId is canonical over tag insertion order") {
    TableMeta(tags = Map("a" -> "1", "b" -> "2")).stableId shouldBe
      TableMeta(tags = Map("b" -> "2", "a" -> "1")).stableId
    TableMeta(tags = Map("a" -> "1")).stableId should not be
      TableMeta(tags = Map("a" -> "2")).stableId
  }

  test("stableId distinguishes tags that collide without escaping") {
    // both serialize to {"a":"1","b":"2"} if quotes aren't escaped
    TableMeta(tags = Map("a" -> "1\",\"b\":\"2")).stableId should not be
      TableMeta(tags = Map("a" -> "1", "b" -> "2")).stableId
    // backslash vs escaped-quote ambiguity
    TableMeta(tags = Map("a" -> "\\")).stableId should not be
      TableMeta(tags = Map("a" -> "\"")).stableId
  }
}
