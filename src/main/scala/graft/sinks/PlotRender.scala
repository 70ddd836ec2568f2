package graft.sinks

import scala.collection.mutable.ArrayBuffer

/** The rendering half of K7 (the reference's `plot_from_spec_impl`,
  * `processors/_impl/plotting_impl.py:157-466`, and `generic_plot`,
  * `utils/adapters/plot_helpers.py:256-552`): a spec → SVG renderer
  * over series already extracted by [[PlotData]]. Driver-side by
  * design — plotting consumes a few thousand collected points, never
  * a distributed frame, so it lives entirely outside the engine
  * (SURVEY §2.9) and emits plain SVG text with zero dependencies.
  *
  * Mirrored semantics (each cites its reference contract):
  *  - grid layout with `rowspan`/`colspan` over an occupancy grid;
  *    auto-placement scans row-major for the next free cell
  *    (`plotting_impl.py:273-279` `_find_next_empty`);
  *  - a subplot whose requested block overlaps an already-placed one
  *    is SKIPPED with a warning, not an exception — specs are often
  *    user-generated and batch runs must survive them
  *    (`plotting_impl.py:322-334`);
  *  - out-of-bounds positions warn and skip; spans clamp to the grid
  *    (`plotting_impl.py:306-318`); auto-placement past a full grid
  *    warns "no space left" and stops (`plotting_impl.py:291-294`);
  *  - series with no explicit color cycle through tab10 (n ≤ 10),
  *    tab20 (n ≤ 20), then golden-ratio-spaced HSV
  *    (`plot_helpers.py:131-160` `get_n_colors`);
  *  - legends with more labels than `legendThreshold` move OUTSIDE
  *    the axes (below, the reference's default strategy) instead of
  *    occluding data (`plot_helpers.py:425-497`).
  *
  * Determinism: no clocks, no randomness, fixed decimal formatting —
  * the same spec always yields byte-identical SVG (golden-testable).
  */
object PlotRender {

  /** One already-extracted series: what [[PlotData.points]] hands over.
    * `style` mirrors the reference's matplotlib shorthand subset:
    * "-" solid, "--" dashed, ":" dotted, "o" adds point markers
    * (combinable, e.g. "o-"). */
  final case class Series(label: String, points: Seq[(Double, Double)],
                          color: Option[String] = None, style: String = "-")

  /** One subplot: position is optional (None → auto-place), spans
    * default to 1×1 as in the reference. */
  final case class Subplot(series: Seq[Series], title: String = "",
                           xLabel: String = "", yLabel: String = "",
                           row: Option[Int] = None, col: Option[Int] = None,
                           rowspan: Int = 1, colspan: Int = 1,
                           legend: Boolean = true)

  /** Whole-figure spec (`layout.rows`/`cols` + suptitle). */
  final case class Spec(subplots: Seq[Subplot], rows: Int = 1, cols: Int = 1,
                        title: String = "", width: Int = 640, height: Int = 360,
                        legendThreshold: Int = 8)

  /** Rendered figure + the reference-style warnings list (placement
    * conflicts, empty series, …) instead of exceptions. */
  final case class Rendered(svg: String, warnings: Seq[String])

  // matplotlib's qualitative palettes (public constants) — the n ≤ 10
  // and n ≤ 20 tiers of get_n_colors.
  private val Tab10 = Vector(
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf")
  private val Tab20 = Vector(
    "#1f77b4", "#aec7e8", "#ff7f0e", "#ffbb78", "#2ca02c", "#98df8a",
    "#d62728", "#ff9896", "#9467bd", "#c5b0d5", "#8c564b", "#c49c94",
    "#e377c2", "#f7b6d2", "#7f7f7f", "#c7c7c7", "#bcbd22", "#dbdb8d",
    "#17becf", "#9edae5")

  /** `get_n_colors` (`plot_helpers.py:131-160`): qualitative maps for
    * small n, golden-ratio-conjugate hue spacing with varied
    * saturation/value beyond 20. */
  def colors(n: Int): Seq[String] = {
    if (n <= 0) Nil
    else if (n <= 10) (0 until n).map(Tab10(_))
    else if (n <= 20) (0 until n).map(Tab20(_))
    else (0 until n).map { i =>
      val golden = 0.618033988749895
      val h = (i * golden) % 1.0
      val s = 0.65 + 0.20 * ((i % 3) / 2.0)
      val v = 0.9 - 0.15 * ((i % 4) / 3.0)
      hsvToHex(h, s, v)
    }
  }

  private def hsvToHex(h: Double, s: Double, v: Double): String = {
    val i = (h * 6).toInt % 6
    val f = h * 6 - math.floor(h * 6)
    val (p, q, t) = (v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s))
    val (r, g, b) = i match {
      case 0 => (v, t, p); case 1 => (q, v, p); case 2 => (p, v, t)
      case 3 => (p, q, v); case 4 => (t, p, v); case _ => (v, p, q)
    }
    f"#${(r * 255).round.toInt}%02x${(g * 255).round.toInt}%02x${(b * 255).round.toInt}%02x"
  }

  private def fmt(d: Double): String = {
    // fixed two-decimal formatting, "-0.00" normalized — Locale.ROOT,
    // not the f-interpolator: a comma-decimal default locale would
    // corrupt every coordinate (and the byte-determinism contract)
    val s = String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    if (s == "-0.00") "0.00" else s
  }

  private def esc(s: String): String = Escape.xml(s)

  /** ~`n` "nice" tick values covering [lo, hi] (1/2/5 ladder). */
  private[sinks] def ticks(lo: Double, hi: Double, n: Int = 5): Seq[Double] = {
    if (!(hi > lo)) return Seq(lo)
    val raw = (hi - lo) / n
    val mag = math.pow(10, math.floor(math.log10(raw)))
    val step = (raw / mag) match {
      case r if r < 1.5 => mag
      case r if r < 3.5 => 2 * mag
      case r if r < 7.5 => 5 * mag
      case _            => 10 * mag
    }
    val first = math.ceil(lo / step) * step
    Iterator.iterate(first)(_ + step).takeWhile(_ <= hi + step * 1e-9).toSeq
  }

  /** Render `spec` to SVG. Never throws on placement problems — they
    * land in `warnings`, matching the reference's batch-robust
    * contract (`plotting_impl.py` returns warnings, not errors). */
  def render(spec: Spec): Rendered = {
    val warnings = ArrayBuffer.empty[String]
    val rows = math.max(1, spec.rows)
    val cols = math.max(1, spec.cols)
    val occupied = Array.fill(rows, cols)(false)
    def nextEmpty(): Option[(Int, Int)] = {
      val it = for { r <- (0 until rows).iterator; c <- 0 until cols
                     if !occupied(r)(c) } yield (r, c)
      if (it.hasNext) Some(it.next()) else None
    }

    val out = new StringBuilder
    out ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="${spec.width}" height="${spec.height}" viewBox="0 0 ${spec.width} ${spec.height}">\n"""
    out ++= s"""<rect width="${spec.width}" height="${spec.height}" fill="white"/>\n"""
    val topPad = if (spec.title.nonEmpty) 24 else 4
    if (spec.title.nonEmpty)
      out ++= s"""<text x="${spec.width / 2}" y="16" text-anchor="middle" font-size="14" font-family="sans-serif" font-weight="bold">${esc(spec.title)}</text>\n"""
    val cellW = (spec.width - 8).toDouble / cols
    val cellH = (spec.height - topPad - 4).toDouble / rows

    var placementClosed = false
    spec.subplots.zipWithIndex.foreach { case (sp, si) =>
      if (!placementClosed) {
        // --- placement (plotting_impl.py:285-338 semantics) ---
        val rowspan = math.max(1, sp.rowspan)
        val colspan = math.max(1, sp.colspan)
        val pos: Option[(Int, Int)] = (sp.row, sp.col) match {
          case (Some(r), Some(c)) => Some((r, c))
          case (None, None) =>
            nextEmpty() match {
              case some @ Some(_) => some
              case None =>
                warnings += s"subplot $si: no space left in grid"
                placementClosed = true // reference `break`s here
                None
            }
          case _ =>
            warnings += s"subplot $si: invalid row/col '${sp.row.orNull}/${sp.col.orNull}'"
            None
        }
        pos.foreach { case (r, c) =>
          if (r < 0 || c < 0 || r >= rows || c >= cols) {
            warnings += s"subplot $si: position ($r,$c) out of grid bounds"
          } else {
            val endR = math.min(rows, r + rowspan)
            val endC = math.min(cols, c + colspan)
            val conflict = (r until endR).exists(ri => (c until endC).exists(ci => occupied(ri)(ci)))
            if (conflict) {
              warnings += s"subplot $si: requested block ($r:$endR,$c:$endC) overlaps existing subplot"
            } else {
              for (ri <- r until endR; ci <- c until endC) occupied(ri)(ci) = true
              renderSubplot(out, sp, si, spec, warnings,
                x0 = 4 + c * cellW, y0 = topPad + r * cellH,
                w = (endC - c) * cellW, h = (endR - r) * cellH)
            }
          }
        }
      }
    }
    out ++= "</svg>\n"
    Rendered(out.toString, warnings.toSeq)
  }

  private def renderSubplot(out: StringBuilder, sp: Subplot, si: Int,
                            spec: Spec, warnings: ArrayBuffer[String],
                            x0: Double, y0: Double, w: Double, h: Double): Unit = {
    // margins inside the cell for axis labels / title / outside legend
    val ml = 46.0; val mr = 10.0
    val mt = if (sp.title.nonEmpty) 22.0 else 8.0
    val labeled = sp.series.filter(_.label.nonEmpty)
    val legendOutside = sp.legend && labeled.size > spec.legendThreshold
    val mb = 30.0 + (if (legendOutside)
      14.0 * math.ceil(labeled.size / 4.0) else 0.0) // bottom strategy, ncol 4
    val (px, py, pw, ph) = (x0 + ml, y0 + mt, w - ml - mr, h - mt - mb)

    val pts = sp.series.flatMap(_.points)
    if (pts.isEmpty) { warnings += s"subplot $si: no data"; return }
    val (xloRaw, xhiRaw) = (pts.map(_._1).min, pts.map(_._1).max)
    val (yloRaw, yhiRaw) = (pts.map(_._2).min, pts.map(_._2).max)
    // degenerate ranges widen symmetrically so a flat series still draws
    val (xlo, xhi) = if (xhiRaw > xloRaw) (xloRaw, xhiRaw) else (xloRaw - 1, xhiRaw + 1)
    val (ylo, yhi) = if (yhiRaw > yloRaw) (yloRaw, yhiRaw) else (yloRaw - 1, yhiRaw + 1)
    def sx(x: Double) = px + (x - xlo) / (xhi - xlo) * pw
    def sy(y: Double) = py + ph - (y - ylo) / (yhi - ylo) * ph

    out ++= s"""<g data-subplot="$si">\n"""
    if (sp.title.nonEmpty)
      out ++= s"""<text x="${fmt(x0 + w / 2)}" y="${fmt(y0 + 14)}" text-anchor="middle" font-size="12" font-family="sans-serif">${esc(sp.title)}</text>\n"""
    // frame + ticks
    out ++= s"""<rect x="${fmt(px)}" y="${fmt(py)}" width="${fmt(pw)}" height="${fmt(ph)}" fill="none" stroke="#444" stroke-width="1"/>\n"""
    ticks(xlo, xhi).foreach { t =>
      out ++= s"""<line x1="${fmt(sx(t))}" y1="${fmt(py + ph)}" x2="${fmt(sx(t))}" y2="${fmt(py + ph + 4)}" stroke="#444"/>\n"""
      out ++= s"""<text x="${fmt(sx(t))}" y="${fmt(py + ph + 14)}" text-anchor="middle" font-size="9" font-family="sans-serif">${esc(shortNum(t))}</text>\n"""
    }
    ticks(ylo, yhi).foreach { t =>
      out ++= s"""<line x1="${fmt(px - 4)}" y1="${fmt(sy(t))}" x2="${fmt(px)}" y2="${fmt(sy(t))}" stroke="#444"/>\n"""
      out ++= s"""<text x="${fmt(px - 6)}" y="${fmt(sy(t) + 3)}" text-anchor="end" font-size="9" font-family="sans-serif">${esc(shortNum(t))}</text>\n"""
    }
    if (sp.xLabel.nonEmpty)
      out ++= s"""<text x="${fmt(px + pw / 2)}" y="${fmt(py + ph + 26)}" text-anchor="middle" font-size="10" font-family="sans-serif">${esc(sp.xLabel)}</text>\n"""
    if (sp.yLabel.nonEmpty)
      out ++= s"""<text x="${fmt(x0 + 12)}" y="${fmt(py + ph / 2)}" text-anchor="middle" font-size="10" font-family="sans-serif" transform="rotate(-90 ${fmt(x0 + 12)} ${fmt(py + ph / 2)})">${esc(sp.yLabel)}</text>\n"""

    // series with style cycling
    val cycle = colors(sp.series.size)
    sp.series.zipWithIndex.foreach { case (s, i) =>
      if (s.points.isEmpty) warnings += s"subplot $si series '${s.label}': no data"
      else {
        val color = s.color.getOrElse(cycle(i))
        // empty style = matplotlib's default solid line ("" would
        // otherwise satisfy both the markers-only vacuous-forall and
        // !contains('o') → render nothing, silently)
        val style = if (s.style.isEmpty) "-" else s.style
        val dash =
          if (style.contains("--")) """ stroke-dasharray="6 3""""
          else if (style.contains(":")) """ stroke-dasharray="2 2""""
          else ""
        val coords = s.points.map { case (x, y) => s"${fmt(sx(x))},${fmt(sy(y))}" }
        if (!style.forall(_ == 'o')) // "o" alone = markers only
          out ++= s"""<polyline points="${coords.mkString(" ")}" fill="none" stroke="$color" stroke-width="1.5"$dash data-series="${esc(s.label)}"/>\n"""
        if (style.contains("o"))
          s.points.foreach { case (x, y) =>
            out ++= s"""<circle cx="${fmt(sx(x))}" cy="${fmt(sy(y))}" r="2.5" fill="$color"/>\n"""
          }
      }
    }

    // legend: inside top-right, or outside-bottom past the threshold.
    // Swatch colors key on the TRUE series index (indexOf would
    // resolve duplicate series to the first occurrence's color).
    val labeledIdx = sp.series.zipWithIndex.filter(_._1.label.nonEmpty)
    if (sp.legend && labeledIdx.nonEmpty) {
      if (!legendOutside) {
        labeledIdx.zipWithIndex.foreach { case ((s, si2), i) =>
          val ly = py + 12 + i * 13
          val color = s.color.getOrElse(cycle(si2))
          out ++= s"""<line x1="${fmt(px + pw - 70)}" y1="${fmt(ly - 3)}" x2="${fmt(px + pw - 56)}" y2="${fmt(ly - 3)}" stroke="$color" stroke-width="1.5"/>\n"""
          out ++= s"""<text x="${fmt(px + pw - 52)}" y="${fmt(ly)}" font-size="9" font-family="sans-serif">${esc(s.label)}</text>\n"""
        }
      } else {
        // reference default strategy: centered below, up to 4 columns
        val ncol = math.min(4, labeledIdx.size)
        val colW = pw / ncol
        labeledIdx.zipWithIndex.foreach { case ((s, si2), i) =>
          val (r, c) = (i / ncol, i % ncol)
          val lx = px + c * colW
          val ly = py + ph + 36 + r * 14
          val color = s.color.getOrElse(cycle(si2))
          out ++= s"""<line x1="${fmt(lx)}" y1="${fmt(ly - 3)}" x2="${fmt(lx + 14)}" y2="${fmt(ly - 3)}" stroke="$color" stroke-width="1.5"/>\n"""
          out ++= s"""<text x="${fmt(lx + 18)}" y="${fmt(ly)}" font-size="9" font-family="sans-serif">${esc(s.label)}</text>\n"""
        }
      }
    }
    out ++= "</g>\n"
  }

  private def shortNum(d: Double): String =
    if (d == d.round.toDouble && math.abs(d) < 1e15) d.round.toString else fmt(d)

  /** Convenience: render and write to `path` (driver-side file, the
    * reference's `save_path`). Returns the warnings. */
  def renderToFile(spec: Spec, path: String): Seq[String] = {
    val r = render(spec)
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p,
      r.svg.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    r.warnings
  }
}
