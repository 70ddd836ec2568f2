package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors the reference's group-split and schema-evolving-append tests
  * (`test/test_df_helpers.py:132-136` NaN groups;
  * `test/test_df_helpers_complex.py:15-101` evolve + regroup flow).
  */
class GroupingAppendSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some("a"), Some(1), 10.0),
    (Some("a"), Some(2), 20.0),
    (Some("b"), Some(1), 30.0),
    (None: Option[String], Some(1), 40.0)
  ).toDF("g", "sub", "v")

  test("aggSplit with empty keys aggregates the whole table") {
    val out = Grouping.aggSplit(df, Nil, Seq(sum($"v").as("total")))
    out.collect().head.getDouble(0) shouldBe 100.0
  }

  test("groupBy keeps null keys (pandas dropna=False parity)") {
    val out = Grouping.aggSplit(df, Seq("g"), Seq(count(lit(1)).as("n")))
    out.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap shouldBe
      Map(Some("a") -> 2L, Some("b") -> 1L, None -> 1L)
  }

  test("split returns (key map, lazy frame) incl. the null group, key cols dropped") {
    val splits = Grouping.split(df, Seq("g"))
    splits.size shouldBe 3
    val byKey = splits.map { case (k, f) => k("g") -> f }.toMap
    byKey(null).columns shouldBe Array("sub", "v")
    byKey(null).count() shouldBe 1
    byKey("a").count() shouldBe 2
  }

  test("split throws past maxGroups — the dimension-sized contract is executable") {
    // the BoundedPairs house pattern: a high-cardinality key column
    // must throw after a bounded (limit cap+1) driver transfer, never
    // collect the full key set into N views
    val wide = spark.range(100).select($"id".as("g"), lit(1.0).as("v"))
    val e = intercept[IllegalArgumentException] {
      Grouping.split(wide, Seq("g"), maxGroups = 50)
    }
    e.getMessage should include("aggSplit")
    e.getMessage should include("splitToDir")
    // at exactly the cap it still works
    Grouping.split(wide, Seq("g"), maxGroups = 100).size shouldBe 100
  }

  test("splitToDir partitions one write per key and reads back one group pruned") {
    val dir = java.nio.file.Files.createTempDirectory("splitdir").toString
    val idx = Grouping.splitToDir(df.filter($"g".isNotNull), Seq("g", "sub"),
      s"$dir/out")
    // 3 non-null (g, sub) combinations → 3 partition directories
    idx.map(_._1) shouldBe Seq(
      Map("g" -> "a", "sub" -> "1"), Map("g" -> "a", "sub" -> "2"),
      Map("g" -> "b", "sub" -> "1"))
    // one partition read back = that group's non-key columns only
    val one = spark.read.parquet(idx.head._2)
    one.columns shouldBe Array("v")
    one.collect().map(_.getDouble(0)) shouldBe Array(10.0)
    // whole-tree read recovers every row with keys as partition columns
    spark.read.parquet(s"$dir/out").count() shouldBe 3
  }

  test("splitToDir recovers special characters in key values ('c++', 'a b')") {
    val dir = java.nio.file.Files.createTempDirectory("splitdir-esc").toString
    val special = Seq(("c++", 1.0), ("a b", 2.0)).toDF("g", "v")
    val idx = Grouping.splitToDir(special, Seq("g"), s"$dir/out")
    idx.map(_._1("g")).sorted shouldBe Seq("a b", "c++")
  }

  test("buckets collects sorted per-key lists") {
    val out = Grouping.buckets(df.filter($"g".isNotNull), "g", "v")
      .orderBy("g").collect()
    out.map(_.getSeq[Double](1)) shouldBe Array(Seq(10.0, 20.0), Seq(30.0))
    out.map(_.getLong(2)) shouldBe Array(2L, 1L)
  }

  test("subtreeRollup adds per-prefix and grand-total rows") {
    val out = Grouping.subtreeRollup(df.na.drop(), Seq("g", "sub"),
      Seq(sum($"v").as("total")))
    out.count() shouldBe 3 + 2 + 1 // leaves + per-g + grand total
    out.filter($"g".isNull && $"sub".isNull)
      .select("total").as[Double].collect() shouldBe Array(60.0)
  }

  test("evolve null-fills missing columns both directions") {
    val a = Seq((1, "x")).toDF("id", "only_a")
    val b = Seq((2, 9.9)).toDF("id", "only_b")
    val out = Append.evolve(a, b).orderBy("id")
    out.columns.sorted shouldBe Array("id", "only_a", "only_b")
    val rows = out.collect()
    rows(0).getAs[String]("only_a") shouldBe "x"
    assert(rows(0).isNullAt(rows(0).fieldIndex("only_b")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("only_a")))
    rows(1).getAs[Double]("only_b") shouldBe 9.9
  }
}
