package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** Reader conventions — S3–S6: text/whole-file/json/csv, and the
  * numeric-column extract's skip-bad-cells tolerance
  * (`io_helpers.py:29-33`: unparseable cells drop, never fail).
  */
class ReadersSpec extends SparkSpec {
  import spark.implicits._

  private def write(name: String, content: String): String = {
    val dir = Files.createTempDirectory("readers")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("csvNumericColumn extracts by name, drops bad cells") {
    val p = write("d.csv", "a,b\n1.5,x\noops,y\n2.5,z\n")
    Readers.csvNumericColumn(spark, p, Some("a"))
      .as[Double].collect().sorted shouldBe Array(1.5, 2.5)
  }

  test("csvNumericColumn defaults to the first column and validates names") {
    val p = write("d.csv", "a,b\n3,x\n4,y\n")
    Readers.csvNumericColumn(spark, p).as[Double].collect().sorted shouldBe
      Array(3.0, 4.0)
    an[IllegalArgumentException] should be thrownBy
      Readers.csvNumericColumn(spark, p, Some("missing"))
  }

  test("wholeText yields one (path, content) row per file") {
    val p = write("t.txt", "line1\nline2")
    val rows = Readers.wholeText(spark, p).collect()
    rows.length shouldBe 1
    rows.head.getAs[String]("content") shouldBe "line1\nline2"
    rows.head.getAs[String]("path") should endWith("t.txt")
  }

  test("json reads nested objects") {
    val p = write("j.json", """{"a": 1, "m": {"x": 2.5}}""")
    val df = Readers.json(spark, p)
    df.select("m.x").as[Double].collect() shouldBe Array(2.5)
  }

  test("kv dict lines parse with comments skipped (S11)") {
    val lines = Seq("# comment", "", "k1 Label One", "k2,Label Two").toDF("value")
    val out = LineRouter.parseKvDict(lines).collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    out shouldBe Array("k1" -> "Label One", "k2" -> "Label Two")
  }
}
