package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Renderer-half of K7: grid placement/occupancy/conflict semantics
  * mirror `plotting_impl.py:273-338`; style cycling mirrors
  * `plot_helpers.py:131-160`; legend-overflow placement mirrors
  * `plot_helpers.py:425-497`. Golden-file test pins byte-exact
  * output (the renderer is clock- and randomness-free by design).
  */
class PlotRenderSpec extends AnyFunSuite with Matchers {
  import PlotRender._

  private val lin = (0 to 10).map(i => (i.toDouble, i * 2.0))
  private val sq = (0 to 10).map(i => (i.toDouble, i * i / 5.0))

  test("auto-placement scans row-major and fills the grid") {
    val r = render(Spec(
      subplots = Seq(
        Subplot(Seq(Series("a", lin))),
        Subplot(Seq(Series("b", sq))),
        Subplot(Seq(Series("c", lin)))),
      rows = 2, cols = 2))
    r.warnings shouldBe empty
    // three subplot groups rendered in order
    (0 to 2).foreach { i => r.svg should include(s"""data-subplot="$i"""") }
  }

  test("overlapping block is skipped with a warning, not an exception") {
    val r = render(Spec(
      subplots = Seq(
        Subplot(Seq(Series("tall", lin)), row = Some(0), col = Some(0), rowspan = 2),
        Subplot(Seq(Series("clash", sq)), row = Some(1), col = Some(0))),
      rows = 2, cols = 2))
    r.warnings should contain("subplot 1: requested block (1:2,0:1) overlaps existing subplot")
    r.svg should include("""data-subplot="0"""")
    r.svg should not include """data-subplot="1""""
  }

  test("out-of-bounds position warns and skips; spans clamp to the grid") {
    val r = render(Spec(
      subplots = Seq(
        Subplot(Seq(Series("off", lin)), row = Some(3), col = Some(0)),
        Subplot(Seq(Series("wide", sq)), row = Some(0), col = Some(0), colspan = 99)),
      rows = 2, cols = 2))
    r.warnings should contain("subplot 0: position (3,0) out of grid bounds")
    r.svg should include("""data-subplot="1"""")
  }

  test("auto-placement past a full grid warns 'no space left' and stops") {
    val r = render(Spec(
      subplots = Seq(
        Subplot(Seq(Series("a", lin))),
        Subplot(Seq(Series("b", sq))),
        Subplot(Seq(Series("c", lin)))),
      rows = 1, cols = 2))
    r.warnings should contain("subplot 2: no space left in grid")
  }

  test("style cycling: tab10 under 10, tab20 under 20, golden-ratio HSV beyond") {
    colors(3) shouldBe Seq("#1f77b4", "#ff7f0e", "#2ca02c")
    colors(12).take(2) shouldBe Seq("#1f77b4", "#aec7e8")
    colors(25).size shouldBe 25
    colors(25).distinct.size shouldBe 25 // golden-ratio hues never collide
    colors(25).foreach(_ should fullyMatch regex "#[0-9a-f]{6}")
  }

  test("explicit series color wins over the cycle") {
    val r = render(Spec(Seq(Subplot(Seq(
      Series("mine", lin, color = Some("#123456")))))))
    r.svg should include("#123456")
  }

  test("legend over the threshold moves outside, geometrically below the axes") {
    // mirrors test_generic_plot_legend.py:8-66: many lines + a low
    // threshold must push the legend below the plot frame
    val many = (0 until 12).map(i => Series(s"line$i", lin))
    val outside = render(Spec(Seq(Subplot(many)), legendThreshold = 1))
    outside.warnings shouldBe empty
    // frame bottom = rect y + height; every legend text must sit below
    val rect = """<rect x="[0-9.]+" y="([0-9.]+)" width="[0-9.]+" height="([0-9.]+)" fill="none"""".r
    val m = rect.findFirstMatchIn(outside.svg).get
    val frameBottom = m.group(1).toDouble + m.group(2).toDouble
    val legendText = """<text x="[0-9.]+" y="([0-9.]+)" font-size="9" font-family="sans-serif">line\d+</text>""".r
    val ys = legendText.findAllMatchIn(outside.svg).map(_.group(1).toDouble).toSeq
    ys should have size 12
    all(ys) should be > frameBottom
    // and below the threshold the legend stays inside the frame
    val inside = render(Spec(Seq(Subplot(many.take(2)))))
    val insideYs = """<text x="[0-9.]+" y="([0-9.]+)" font-size="9" font-family="sans-serif">line\d+</text>""".r
      .findAllMatchIn(inside.svg).map(_.group(1).toDouble).toSeq
    all(insideYs) should be < frameBottom
  }

  test("dashed and marker styles emit dasharray / circles") {
    val r = render(Spec(Seq(Subplot(Seq(
      Series("d", lin, style = "--"),
      Series("m", sq, style = "o-"),
      Series("only", lin.take(3), style = "o"))))))
    r.svg should include("stroke-dasharray=\"6 3\"")
    r.svg should include("<circle")
    // markers-only series has no polyline
    r.svg should not include """data-series="only""""
  }

  test("empty series and empty subplot warn instead of throwing") {
    val r = render(Spec(Seq(
      Subplot(Seq(Series("ok", lin), Series("hollow", Nil))),
      Subplot(Nil)), rows = 1, cols = 2))
    r.warnings should contain("subplot 1: no data")
    r.warnings should contain("subplot 0 series 'hollow': no data")
  }

  test("golden file: byte-exact SVG for the reference-shaped demo spec") {
    val spec = Spec(
      title = "demo",
      rows = 2, cols = 2,
      subplots = Seq(
        Subplot(Seq(Series("lin", lin), Series("sq", sq, style = "--")),
          title = "left tall", xLabel = "x", yLabel = "y",
          row = Some(0), col = Some(0), rowspan = 2),
        Subplot(Seq(Series("flat", Seq((0.0, 1.0), (5.0, 1.0)))),
          title = "flat", row = Some(0), col = Some(1)),
        Subplot(Seq(Series("dots", sq.take(5), style = "o")))),
      width = 400, height = 300)
    val got = render(spec)
    got.warnings shouldBe empty
    val goldenPath = java.nio.file.Paths.get(
      "src/test/resources/golden/plot_demo.svg")
    if (!java.nio.file.Files.exists(goldenPath)) {
      java.nio.file.Files.createDirectories(goldenPath.getParent)
      java.nio.file.Files.write(goldenPath, got.svg.getBytes("UTF-8"))
      fail("golden file created on first run — rerun to compare")
    }
    val want = new String(java.nio.file.Files.readAllBytes(goldenPath), "UTF-8")
    got.svg shouldBe want
  }

  test("renderToFile writes the SVG and returns warnings") {
    val dir = java.nio.file.Files.createTempDirectory("plotrender").toString
    val warnings = renderToFile(
      Spec(Seq(Subplot(Seq(Series("a", lin))), Subplot(Nil)),
        rows = 1, cols = 2),
      s"$dir/out.svg")
    warnings shouldBe Seq("subplot 1: no data")
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/out.svg")), "UTF-8") should startWith("<svg")
  }
}
