package graft.ext

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** BPE TRAINING (Sennrich et al. 2016) — the loop that mints the
  * ranked merge tables [[BpeTokenizer]] / [[graft.functions.BpeSegment]]
  * apply: q54's corpus pair-count is its first iteration; this closes
  * the seam so learn → apply → budget runs end-to-end in-engine.
  *
  * Distributed shape (the classic trick, kept): training never
  * iterates the CORPUS — one corpus scan builds the word VOCABULARY
  * (word, count), then every iteration is a scan of the vocab only:
  * segment each word under the merges found so far (the codegen'd
  * min-rank expression — map-side), explode adjacent token pairs
  * weighted by word count, one small pair-count shuffle, and a
  * 1-row argmax to the driver (count desc, then (lhs, rhs) binary
  * ascending — the deterministic tie the oracle replays). At 100 TB
  * the corpus is touched ONCE; the vocab (Zipf: millions of rows,
  * not billions) is what iterates, localCheckpointed so no lineage
  * grows across rounds (the DupClusters lesson).
  *
  * Trained tables are CONSISTENT by construction — merge i's sides
  * are tokens of the post-(i−1) segmentation, i.e. single characters
  * or earlier outputs — so the min-rank loop used here and the
  * rank-sequential sweep chain the SQL oracle replays provably agree
  * (the BpeTokenizer scaladoc proof).
  */
object BpeTrainer {

  /** One learned merge: rank order is the Seq order. */
  final case class Merge(lhs: String, rhs: String, pairCount: Long)

  /** Adjacent (lhs, rhs) token pairs of a token-array column (caller
    * filters size ≥ 2 first — `sequence` needs a non-negative range).
    */
  private def adjacentPairs(toks: Column): Column =
    transform(sequence(lit(1), size(toks) - 1), i =>
      struct(element_at(toks, i).as("lhs"),
        element_at(toks, i + 1).as("rhs")))

  /** Learn up to `nMerges` merges from `textCol` (whitespace
    * pretokenization, code-point base alphabet — [[BpeTokenizer]]'s
    * word mode; pass `byteLevel = true` for the GPT-2 byte-alphabet
    * mode). Stops early when no adjacent pair is left to merge.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
            byteLevel: Boolean = false): Seq[Merge] = {
    require(nMerges >= 1 && nMerges <= graft.functions.BpeModel.MaxMerges,
      s"BpeTrainer: nMerges $nMerges outside [1, ${graft.functions.BpeModel.MaxMerges}]")
    val vocab = docs
      .select(explode(graft.functions.BpeSegment.words(
        col(textCol), byteLevel)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    while (learned.size < nMerges && !exhausted) {
      // NOTE the vocab rows are WORDS of the BASE pretokenization:
      // when training byte-level, "word" is already a mapped-byte
      // string, so re-segmentation below runs in WORD mode (code
      // points of the mapped alphabet) for every round.
      val merges = learned.map(m => (m.lhs, m.rhs)).toSeq
      val toks = graft.functions.BpeSegment.tokens(col("word"), merges)
      val best = vocab
        .select(col("cnt"), toks.as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("cnt"), explode(adjacentPairs(col("t"))).as("p"))
        .groupBy(col("p.lhs"), col("p.rhs"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(desc("c"), asc("lhs"), asc("rhs"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val r = best(0)
        learned += Merge(r.getString(0), r.getString(1), r.getLong(2))
      }
    }
    vocab.unpersist()
    learned.toSeq
  }

  /** The learned table in the shape the appliers take. */
  def mergeTable(merges: Seq[Merge]): Seq[(String, String)] =
    merges.map(m => (m.lhs, m.rhs))

  /** Persist a trained table (rank, lhs, rhs, pair_count) — a trained
    * tokenizer is a deployment ARTIFACT like the index family's
    * centroids: train once, apply from every later session. One
    * parquet file; rank order IS the ranking, re-validated on load.
    */
  def save(spark: org.apache.spark.sql.SparkSession, path: String,
           merges: Seq[Merge]): Unit = {
    require(merges.nonEmpty, "BpeTrainer.save: empty merge table")
    import spark.implicits._
    merges.zipWithIndex
      .map { case (m, i) => (i, m.lhs, m.rhs, m.pairCount) }
      .toDF("rank", "lhs", "rhs", "pair_count")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }

  /** Load a persisted table in rank order. Throws on a rank gap /
    * duplicate (a torn or hand-edited artifact) — the appliers'
    * semantics depend on the EXACT ranking, so a silently reordered
    * table would segment differently.
    */
  def load(spark: org.apache.spark.sql.SparkSession,
           path: String): Seq[Merge] = {
    val rows = spark.read.parquet(path)
      .select(col("rank").cast("int"), col("lhs"), col("rhs"),
        col("pair_count").cast("long"))
      .collect()
      .sortBy(_.getInt(0))
    require(rows.nonEmpty, s"BpeTrainer.load: empty merge table at $path")
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i,
        s"BpeTrainer.load: rank gap/duplicate at $path — expected rank " +
          s"$i, found ${r.getInt(0)}; the artifact is torn or edited")
    }
    rows.toSeq.map(r => Merge(r.getString(1), r.getString(2), r.getLong(3)))
  }
}
