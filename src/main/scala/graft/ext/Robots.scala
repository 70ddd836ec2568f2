package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt allow/disallow ELECTION over a URL corpus — the other
  * half of [[graft.functions.RobotsRules]]: given per-host prefix
  * rules (one robots fetch per host, exploded to a (host, allow,
  * prefix) frame), decide each URL by the REP rule: the LONGEST
  * matching prefix wins, Allow wins a length tie, and a URL with no
  * matching rule is allowed.
  *
  * Scale shape: the rules frame is per-host metadata (tiny next to
  * the corpus) — ONE broadcast left join on host with the prefix
  * match in the join condition, then one aggregation electing
  * `max(struct(prefix_len, allow))` per URL. The corpus never
  * shuffles on anything but its own key; rows with no matching rule
  * survive the left join as a single null row and elect to allowed.
  */
object Robots {

  /** Decorate `urls` with the election's verdict.
    *
    * @param urls  corpus frame carrying `hostCol` and `pathCol`
    *              (plus any other columns — all preserved)
    * @param rules (hostCol, allow boolean, prefix string) — the
    *              agent's rules per host, e.g.
    *              `robots_rules(txt, agent)` exploded
    * @param keyCols the URL frame's unique key (the aggregation's
    *                group-by; all other columns ride via `first`)
    */
  def withAllowed(urls: DataFrame, rules: DataFrame,
                  keyCols: Seq[String],
                  hostCol: String = "host", pathCol: String = "path",
                  outCol: String = "allowed"): DataFrame =
    // startsWith stays the join predicate (codegen'd builtin) — the
    // pattern face pays robots_match only where wildcards can occur
    elect(urls, rules, keyCols, hostCol, pathCol, "prefix", outCol,
      (path, rule) => path.startsWith(rule))

  /** The ONE election skeleton both faces share: broadcast the rules,
    * left-join on host + the match predicate, elect
    * `max(struct(rule_len, allow))` per key — most octets win, Allow
    * wins the tie (a=1 > a=0 inside the struct order), no match ⇒
    * allowed.
    */
  private def elect(urls: DataFrame, rules: DataFrame,
                    keyCols: Seq[String], hostCol: String, pathCol: String,
                    ruleCol: String, outCol: String,
                    matches: (Column, Column) => Column): DataFrame = {
    val r = broadcast(rules.select(
      col(hostCol).as("_r_host"), col("allow").as("_r_allow"),
      col(ruleCol).as("_r_rule")))
    val joined = urls.join(r,
      urls(hostCol) === col("_r_host") &&
        matches(urls(pathCol), col("_r_rule")), "left")
    val others = urls.columns.filterNot(keyCols.contains)
    val verdict = max(when(col("_r_rule").isNotNull,
        struct(length(col("_r_rule")).as("l"),
          col("_r_allow").cast("int").as("a"))))
    joined.groupBy(keyCols.map(col): _*)
      .agg(verdict.as("_v"),
        others.map(c => first(col(c)).as(c)): _*)
      .withColumn(outCol,
        coalesce(col("_v").getField("a") === 1, lit(true)))
      .drop("_v", "_r_host", "_r_allow", "_r_rule")
  }

  /** [[withAllowed]] generalized to RFC 9309 WILDCARD rules: `rules`
    * carries (hostCol, allow, pattern) where a pattern may use `*`
    * (any run) and a trailing `$` (end anchor) — a pattern without
    * either is the plain prefix rule, so this face subsumes the
    * prefix election. The match rides the broadcast-join condition as
    * the codegen'd `robots_match` expression; specificity is the
    * pattern's octet length (the RFC's most-octets rule), Allow wins
    * ties, no match ⇒ allowed. Same scale shape as [[withAllowed]]:
    * one broadcast join + one aggregation, corpus never reshuffles.
    */
  def withAllowedPatterns(urls: DataFrame, rules: DataFrame,
                          keyCols: Seq[String],
                          hostCol: String = "host", pathCol: String = "path",
                          outCol: String = "allowed"): DataFrame =
    elect(urls, rules, keyCols, hostCol, pathCol, "pattern", outCol,
      (path, rule) =>
        graft.functions.RobotsFunctions.robotsMatch(path, rule))
}
