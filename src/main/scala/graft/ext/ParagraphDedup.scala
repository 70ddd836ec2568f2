package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paragraph-level exact dedup (north-star ✚) — the third granularity
  * of the exact-dedup family: document level is [[Dedup.exactDupGroups]],
  * token-window (substring) level is [[SubstringDedup]], and THIS is
  * the blank-line-block level the public web-corpus recipes scrub —
  * boilerplate paragraphs (license blocks, navigation footers,
  * subscribe prompts) repeat across millions of pages whose documents
  * are otherwise unique, so document-level dedup never sees them and
  * window-level dedup pays token arithmetic for what is an exact
  * block match.
  *
  * Semantics (keep-first election, mirroring [[SubstringDedup]]):
  * paragraphs are the `\n\n`-split blocks of the text, compared
  * EXACTLY (no normalization — portable by construction); each
  * distinct non-empty paragraph is owned by the minimum-id document
  * containing it, which keeps ALL its occurrences; every other
  * document loses every occurrence. Empty blocks (split artifacts)
  * never participate and survive in place, so document structure
  * round-trips.
  *
  * Scale shape: the election shuffles only (id, pos, md5) triples —
  * TEXT NEVER SHUFFLES. Removals come back as one per-doc position
  * array through an id-keyed join, and the text is re-split and
  * reassembled map-side from the original scan (the q123 pattern).
  */
object ParagraphDedup {

  /** The paragraph boundary: one or more blank lines would need a
    * regex both engines share — the exact two-newline form is the
    * portable core and the public recipes' default.
    */
  val Separator = "\n\n"

  /** Dedup `textCol` at paragraph granularity. Returns the input
    * columns plus `n_paras` (all split blocks, empties included),
    * `removed_paras`, and `clean_text` (surviving blocks re-joined in
    * original order).
    */
  def dedup(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val parts = split(col(textCol), Separator)
    val paras = docs
      .select(col(idCol), posexplode(parts).as(Seq("pos", "para")))
      .filter(col("para") =!= "")
      .select(col(idCol), col("pos"), md5(col("para")).as("ph"))
    val owners = paras.groupBy(col("ph")).agg(min(col(idCol)).as("owner"))
    val removals = paras.join(owners, Seq("ph"))
      .filter(col(idCol) =!= col("owner"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("drop_pos"))
    docs.join(removals, Seq(idCol), "left")
      .withColumn("n_paras", size(parts))
      .withColumn("removed_paras",
        coalesce(size(col("drop_pos")), lit(0)))
      .withColumn("clean_text",
        array_join(
          filter(parts, (p, i) =>
            !coalesce(array_contains(col("drop_pos"), i), lit(false))),
          Separator))
      .drop("drop_pos")
  }
}
