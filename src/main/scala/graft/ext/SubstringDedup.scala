package graft.ext

import graft.functions.WindowHashFunctions.{removeTokenSpans, tokenWindowHashes}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ✚ Substring-level EXACT dedup — the public sub-document dedup
  * family (`ext/Dedup` covers whole-document exact and near-dup; a
  * standard LLM-data pipeline ALSO removes *repeated long substrings
  * across documents*: boilerplate headers, license blocks, quoted
  * passages — the suffix-array/50-token-window method of
  * "Deduplicating Training Data Makes Language Models Better", Lee et
  * al. 2022). A suffix array is the wrong shape for a distributed
  * engine; the Spark-native equivalent of "find every k-token
  * substring occurring in more than one document" is fixed-width
  * window fingerprints + one group-by:
  *
  *  1. **Window hashes, map-side**: `token_window_hashes(text, k)`
  *     (native codegen'd expression — rolling polynomial, O(1) per
  *     window) + `posexplode` → (doc, pos, window-hash). No shuffle;
  *     row volume = token volume.
  *  2. **Duplicate election, one shuffle**: windows grouped by hash;
  *     a hash held by ≥ 2 DISTINCT documents is a cross-document
  *     duplicate, and its canonical occurrence set is the MINIMUM
  *     doc id holding it (deterministic, join-free to elect —
  *     `min(id)` rides the same aggregate). Within-document repeats
  *     are deliberately out of scope (that is q56's repetition
  *     signal, a quality score, not a dedup).
  *  3. **Span removal, map-side after one id-keyed join**: every
  *     non-canonical occurrence's `[pos, pos+k)` token window is
  *     removed from its document; overlapping windows merge into
  *     spans inside `remove_token_spans`' single linear sweep
  *     (O(tokens + removed windows) per doc — never per-token ×
  *     per-span). The removed-starts frame is duplicate-occurrences
  *     only (≪ corpus), joined back to the corpus by id once; text
  *     itself never shuffles.
  *
  * Keep-one semantics: every occurrence in the minimum-id document
  * survives (including its own internal repeats); every occurrence in
  * any later document is scrubbed. Re-running on the cleaned corpus is
  * a no-op for the removed mass (the canonical copies remain, but a
  * window must appear in 2+ docs to be scrubbed).
  *
  * Hash collisions: two DIFFERENT k-token substrings sharing a window
  * fingerprint would be scrubbed as if equal. The fingerprint is a
  * packed TWO-LANE 62-bit code ([[graft.functions.WindowHashOps]]) —
  * a single 31-bit lane birthday-collides SYSTEMATICALLY at corpus
  * scale (measured: ~19 M tokens scrubbed spuriously at 8 M docs /
  * 10^8 windows before the second lane landed; expected colliding
  * pairs at that volume ~10^6), while two independent lanes put the
  * per-pair odds at ~2^-62 (~3·10^-3 expected collisions at 10^8
  * windows) and stay BIGINT-replayable, so the DuckDB oracle (q123)
  * still replays hashing, election, and span removal exactly, and
  * any residual collision fires identically on both engines by
  * construction. Where even that is too hot, re-verify survivors
  * against `ext/Dedup`'s exact-string equality — the published
  * method itself tolerates fingerprint merges.
  *
  * 100 TB posture: stage 2's group-by is the only shuffle over the
  * window stream (map-side partial aggregation applies; the join back
  * to windows reuses the same hash partitioning), stage 3's join is
  * id-keyed with the small side aggregated per doc, and every text
  * pass is a codegen'd scan. k is the published 50-token dial (small
  * k over-merges: pass the corpus' real boilerplate length).
  */
object SubstringDedup {

  /** The removed-occurrence starts per document: (idCol, starts
    * array<long> of removed window start positions, sorted). Documents
    * with nothing to remove are absent. Exposed separately so audits
    * can inspect WHAT would be removed without rewriting any text.
    */
  def removedWindowStarts(docs: DataFrame, textCol: String, idCol: String,
                          k: Int): DataFrame = {
    require(k >= 2, s"SubstringDedup: k-token windows need k >= 2, got $k " +
      "— k=1 would scrub every repeated word (the published dial is ~50)")
    val win = docs
      .select(col(idCol), posexplode(tokenWindowHashes(col(textCol), k)))
      .toDF(idCol, "pos", "wh")
    val dup = win.groupBy(col("wh"))
      .agg(min(col(idCol)).as("keep_id"),
           countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") > 1)
      .select(col("wh"), col("keep_id"))
    win.join(dup, Seq("wh"))
      .filter(col(idCol) =!= col("keep_id"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos").cast("long"))).as("starts"))
  }

  /** The corpus with every cross-document duplicate k-token span
    * scrubbed: all input columns plus `n_tokens`, `removed_windows`,
    * `removed_tokens`, and `clean_text` (survivor tokens re-joined
    * with ' '; untouched documents round-trip their text exactly).
    */
  def dedup(docs: DataFrame, textCol: String, idCol: String,
            k: Int = 50): DataFrame = {
    val removed = removedWindowStarts(docs, textCol, idCol, k)
    val emptyStarts = array().cast("array<long>")
    docs.join(removed, Seq(idCol), "left")
      .withColumn("__sd", removeTokenSpans(
        col(textCol), coalesce(col("starts"), emptyStarts), k))
      .withColumn("n_tokens", col("__sd.n_tokens"))
      .withColumn("removed_windows",
        when(col("starts").isNull, 0L).otherwise(size(col("starts")).cast("long")))
      .withColumn("removed_tokens", col("__sd.removed_tokens"))
      .withColumn("clean_text", col("__sd.clean_text"))
      .drop("__sd", "starts")
  }
}
