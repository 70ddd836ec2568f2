package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation (north-star ✚) — the
  * URL-keyed dedup pass that runs BEFORE content dedup in the public
  * web-pipeline recipes: the same page arrives as http/https,
  * with/without `www.`, with tracking parameters, trailing slashes
  * and fragments, and a corpus that dedups on the raw string keeps
  * every variant. Everything here is Spark `Column` expressions over
  * the java.regex ∩ RE2 portable subset (the q98 rule) plus
  * engine-portable string/array ops, so a SQL oracle replays the
  * exact normalized keys. ASCII URLs by design (IDN/percent-decoding
  * is out of scope, same stance as the rest of the string surface).
  *
  * Scale shape: pure MAP-SIDE — normalization fuses into whatever
  * scan reads the url column; the dedup itself is the engine's
  * ordinary hash group-by on the normalized key.
  */
object UrlOps {

  /** Query parameters dropped by [[normalizeUrl]]: the common
    * click-tracking families (any `utm_*`, and exact `fbclid` /
    * `gclid` / `ref`). Extend per deployment — each entry is one
    * more predicate in the same filter.
    */
  private def isTracking(p: Column): Column =
    p.startsWith("utm_") || p.startsWith("fbclid=") ||
      p.startsWith("gclid=") || p.startsWith("ref=") ||
      p === "fbclid" || p === "gclid" || p === "ref"

  /** Canonical form: scheme stripped, userinfo dropped, leading
    * `www.` stripped, host lowercased, default ports (:80/:443)
    * collapsed (a non-default port is a different endpoint and
    * stays), fragment dropped, tracking params dropped, surviving
    * params SORTED (order-insensitive key), trailing path slash
    * trimmed, bare-root path collapsed. Deterministic and
    * engine-portable end to end.
    */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noScheme = regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    // userinfo is dropped (fetchers treat user@host as host) and the
    // DEFAULT ports collapse (:80/:443 — the scheme is already gone,
    // so both defaults strip; a non-default port is a DIFFERENT
    // endpoint and stays)
    val noUser = regexp_replace(noScheme, "^[^/?@]*@", "")
    val noWww = regexp_replace(noUser, "^www\\.", "")
    val host = regexp_replace(
      lower(regexp_extract(noWww, "^[^/?]*", 0)), ":(80|443)$", "")
    val rest = regexp_replace(noWww, "^[^/?]*", "")
    val path0 = regexp_replace(rest, "\\?.*$", "")
    val path = when(path0 === "/", lit(""))
      .otherwise(regexp_replace(path0, "/$", ""))
    val query = when(rest.contains("?"),
      regexp_replace(rest, "^[^?]*\\?", "")).otherwise(lit(""))
    val kept = array_sort(filter(split(query, "&"),
      p => p =!= "" && !isTracking(p)))
    val q = concat_ws("&", kept)
    concat(host, path,
      when(length(q) > 0, concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Host of a normalized frontier key (everything before the first
    * `/`; the whole key for a bare host) — ONE definition of the
    * key's decomposition for every robots-election caller.
    */
  def hostOf(nurl: Column): Column = substring_index(nurl, "/", 1)

  /** Path of a normalized frontier key (empty for a bare host). */
  def pathOf(nurl: Column): Column = {
    val host = hostOf(nurl)
    nurl.substr(length(host) + 1, length(nurl))
  }

  /** `df` decorated with `host`/`path` columns from `nurlCol`. */
  def withHostPath(df: org.apache.spark.sql.DataFrame,
                   nurlCol: String = "nurl"): org.apache.spark.sql.DataFrame =
    df.withColumn("host", hostOf(col(nurlCol)))
      .withColumn("path", pathOf(col(nurlCol)))

  /** Multi-label public suffixes the naive last-2-labels rule gets
    * wrong. A real deployment loads the full public-suffix list as a
    * broadcast table; this built-in set covers the common families so
    * the OPERATOR SHAPE (suffix-aware label count) is right, and
    * extending it is data, not code.
    */
  val MultiLabelSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp",
      "co.nz", "com.br", "co.in")

  /** Registered domain of a URL: last two host labels, or last three
    * when the last two are a multi-label public suffix. Hosts with
    * fewer labels pass through unchanged.
    */
  def registeredDomain(url: Column): Column = {
    val noScheme = regexp_replace(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val noUser = regexp_replace(noScheme, "^[^/?#@]*@", "")
    val host = regexp_replace(lower(regexp_extract(
      regexp_replace(noUser, "^www\\.", ""), "^[^/?#]*", 0)),
      ":[0-9]+$", "")
    val parts = split(host, "\\.")
    val n = size(parts)
    val last2 = concat(element_at(parts, -2), lit("."),
      element_at(parts, -1))
    when(n <= 2, host)
      .when(last2.isInCollection(MultiLabelSuffixes) && n >= 3,
        concat(element_at(parts, -3), lit("."), last2))
      .otherwise(last2)
  }
}
