package graft.ext

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.functions._

/** BPE tokenization APPLY (north-star ✚) — real byte-pair-encoding
  * segmentation under a ranked merge table, replacing the engine's
  * earlier "BPE-ish regex" approximation for token budgeting: given
  * merges learned elsewhere (training is a corpus-statistics job —
  * q54's pair counts are its first iteration; the merge table is an
  * input here, like the classifier's weights), segment each
  * whitespace word into subwords and count them. Token counts are
  * what packing (q96), mixing (q95) and budget accounting actually
  * need at 100 TB.
  *
  * Algorithm, chosen for bit-portable replay: each word is exploded
  * to space-separated characters, then the merges apply IN RANK
  * ORDER, each as ONE literal `replace("l r" → "lr")` — literal
  * replace substitutes left-to-right non-overlapping in both engines,
  * which is exactly BPE's leftmost-first merge of all of a pair's
  * occurrences. Rank-sequential exhaustive application equals the
  * reference min-rank-loop application FOR CONSISTENT merge tables
  * (each side of a merge is a single character or the output of an
  * EARLIER merge — then a merge can never create a lower-ranked
  * pair), and [[validateMerges]] REQUIRES consistency plus
  * space-free symbols, loudly: an inconsistent table is a caller
  * bug, not a silently different segmentation.
  *
  * Scale shape: pure map-side Column ops (split / per-word fold of
  * k literal replaces / size) — the tokenizer fuses into whatever
  * scan reads the text; no UDF, no shuffle, SQL-replayable by
  * construction (the oracle chains the same k replaces).
  */
object BpeTokenizer {

  /** Sanity cap: each merge adds one `replace` per word to the plan. */
  val MaxMerges: Int = 256

  /** Throws unless the table is a CONSISTENT ranked merge list (the
    * precondition for rank-sequential application ≡ min-rank-loop
    * application): every side is a single character or the
    * concatenation produced by an earlier merge, and no symbol
    * contains a space (the working separator).
    */
  def validateMerges(merges: Seq[(String, String)]): Unit = {
    require(merges.nonEmpty && merges.size <= MaxMerges,
      s"BpeTokenizer: merge count ${merges.size} outside [1, $MaxMerges]")
    val produced = scala.collection.mutable.Set.empty[String]
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      require(l.nonEmpty && r.nonEmpty && !l.contains(" ") && !r.contains(" "),
        s"BpeTokenizer: merge $i ($l, $r) — symbols must be non-empty " +
          "and space-free")
      Seq(l, r).foreach { s =>
        require(s.length == 1 || produced.contains(s),
          s"BpeTokenizer: merge $i side '$s' is neither a single " +
            "character nor the output of an earlier merge — the table " +
            "is inconsistent, so rank-sequential application would " +
            "diverge from the reference min-rank loop")
      }
      produced += (l + r)
    }
  }

  /** One word → its space-separated subword string under the merges:
    * explode to characters, apply each merge in rank order as a
    * literal replace.
    */
  private def segmentWord(word: Column,
                          merges: Seq[(String, String)]): Column = {
    val spaced = trim(regexp_replace(word, "(.)", "$1 "))
    merges.foldLeft(spaced) { case (s, (l, r)) =>
      F.replace(s, lit(l + " " + r), lit(l + r))
    }
  }

  /** Per-document subword token ARRAY (words segmented independently,
    * results concatenated in order; the empty word contributes no
    * tokens).
    */
  def tokens(text: Column, merges: Seq[(String, String)]): Column = {
    validateMerges(merges)
    flatten(transform(
      F.filter(split(text, " "), w => w =!= ""),
      w => split(segmentWord(w, merges), " ")))
  }

  /** Per-document subword token COUNT without materializing a
    * per-DOCUMENT token array: Σ over words of the segmented word's
    * token count (one segmentation evaluation per word).
    */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column = {
    validateMerges(merges)
    aggregate(
      F.filter(split(text, " "), w => w =!= ""),
      lit(0L),
      (acc, w) => acc + size(split(segmentWord(w, merges), " ")))
  }
}
