package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** K8 report writers: backend-neutral blocks, bounded frame→table
  * bridge, markdown and HTML rendering (`docx_helpers.py:4-115` shape).
  */
class ReportSpec extends SparkSpec {
  import spark.implicits._

  private def statsFrame = Seq(("a", 3L), ("b", 5L)).toDF("key", "n")

  test("builder assembles blocks in order") {
    val blocks = Report.builder()
      .heading(1, "Run Report")
      .paragraph("Summary of the run.", align = "center")
      .frame(statsFrame, caption = Some("per-key counts"))
      .figure("plots/hist.png", Some("distribution"))
      .build()
    blocks.map(_.getClass.getSimpleName) shouldBe
      List("Heading", "Paragraph", "Table", "Figure")
  }

  test("frame table keeps header, rows, and caption") {
    val t = Report.table(statsFrame.orderBy("key"), caption = Some("counts"))
    t.header shouldBe Seq("key", "n")
    t.rows shouldBe Seq(Seq("a", "3"), Seq("b", "5"))
    t.caption shouldBe Some("counts")
  }

  test("collect is capped and truncation is visible, not silent") {
    val big = spark.range(50).select(col("id"), (col("id") * 2).as("v"))
    val t = Report.table(big, maxRows = 10)
    t.rows should have size 11
    t.rows.last.head should include("truncated at 10")
  }

  test("markdown renders a GFM table and escapes pipes") {
    val md = MarkdownRenderer.render(Seq(
      Report.Heading(2, "Stats"),
      Report.Table(Seq("k"), Seq(Seq("a|b")), Some("cap"))))
    md should include("## Stats")
    md should include("| k |")
    md should include("a\\|b")
    md should include("*Table: cap*")
  }

  test("html renders escaped cells and figure captions") {
    val html = HtmlRenderer.render(Seq(
      Report.Paragraph("x < y", align = "right"),
      Report.Figure("f.png", Some("fig"), widthInches = Some(2.0)),
      Report.Table(Seq("k"), Seq(Seq("<b>")), None)))
    html should include("x &lt; y")
    html should include("text-align:right")
    html should include("""width="192"""")
    html should include("&lt;b&gt;")
  }

  test("write produces a file") {
    val p = java.nio.file.Files.createTempDirectory("graft_report_")
      .resolve("r.md").toString
    Report.builder().heading(1, "T").frame(statsFrame).write(p, MarkdownRenderer)
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
      .should(include("# T"))
  }
}
