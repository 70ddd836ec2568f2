package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The data-extraction half of the reference's plot renderer — K7's
  * per-series extractor closures (`plotting_impl.py:344-376`,
  * `plot_helpers.py:97-118`): each series is a (filter, x, y) spec
  * over a table; rendering itself stays driver-side on collect()ed
  * rows and out of the relational engine by design (SURVEY §2.9).
  */
object PlotData {

  /** One series: label + row filter + x/y projections. */
  final case class SeriesSpec(label: String, where: Column, x: Column, y: Column)

  /** Extract all series as one long-form frame (series, x, y) — the
    * shape every renderer consumes, and a single pass per series over
    * the source with the filter pushed down.
    */
  def extract(df: DataFrame, series: Seq[SeriesSpec]): DataFrame =
    series.map { s =>
      df.filter(s.where)
        .select(lit(s.label).as("series"), s.x.as("x"), s.y.as("y"))
    }.reduce(_ unionAll _)

  /** Driver-side handoff: collect one series' points, capped — the
    * boundary where data leaves the engine for a renderer.
    */
  def points(df: DataFrame, spec: SeriesSpec,
             maxPoints: Int = 100000): Array[(Double, Double)] =
    df.filter(spec.where)
      .select(spec.x.cast("double"), spec.y.cast("double"))
      .limit(maxPoints)
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
}
