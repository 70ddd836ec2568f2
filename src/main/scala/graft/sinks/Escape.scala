package graft.sinks

/** The one XML/HTML text escaper for every sink renderer (SVG, OOXML,
  * HTML). Quote-escaping included so the same helper is safe in
  * attribute context — escaping quotes in text content is harmless.
  */
private[sinks] object Escape {
  def xml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
}
