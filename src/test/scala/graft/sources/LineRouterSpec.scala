package graft.sources

import graft.SparkSpec

/** Line-router semantics: routing, payload extraction, and the
  * null-on-bad-cell tolerance under ANSI mode (a malformed CSV cell or
  * short line must yield null, never fail the scan).
  */
class LineRouterSpec extends SparkSpec {
  import spark.implicits._

  test("routes and payloads for all line kinds, bad cells null out") {
    val lines = Seq(
      "CSV:u1,2.5",
      "CSV:u2",            // short line → num null
      "CSV:u3,notnum",     // bad cell → num null
      """JSON:{"k": "u4", "v": 7.25}""",
      """JSON:{"k": "u5"}""", // missing v → null
      "42.5",
      "-3",
      "garbage"
    ).toDF("value")
    val out = LineRouter.parse(lines).collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        Option(r.get(2)).map(_.toString).orNull,
        if (r.isNullAt(3)) null else r.getDouble(3).toString))).toMap

    out("CSV:u1,2.5") shouldBe (("csv", "u1", "2.5"))
    out("CSV:u2") shouldBe (("csv", "u2", null))
    out("CSV:u3,notnum") shouldBe (("csv", "u3", null))
    out("""JSON:{"k": "u4", "v": 7.25}""") shouldBe (("json", "u4", "7.25"))
    out("""JSON:{"k": "u5"}""") shouldBe (("json", "u5", null))
    out("42.5") shouldBe (("numeric", null, "42.5"))
    out("-3") shouldBe (("numeric", null, "-3.0"))
    out("garbage") shouldBe (("other", null, null))
  }
}
