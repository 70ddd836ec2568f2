package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured recall side of the banding trade (`BucketCensus` measures
  * the volume side): for each banding setting, the fraction of TRUE
  * near-dup pairs (brute-force exact Jaccard ≥ threshold over a
  * bounded fixture slice, `BoundedPairs` ground truth — the q97
  * machinery) that the banded LSH path recovers. Together the two
  * tools replace the S-curve theory column with corpus numbers:
  * volume at 8 M docs per banding, recall at fixture scale per
  * banding.
  *
  * Usage: `RecallSweep [sfDir] [maxDocId] [bands,...]` (defaults
  * /root/testdata/sf0.1, 1500 — inside BoundedPairs' 2 k cap — and
  * 2,3,4,6 with numHashes=24, the BucketCensus sweep settings).
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxDocId = args.drop(1).headOption.map(_.toLong).getOrElse(1500L)
    val bands = args.drop(2).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(2, 3, 4, 6))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.{BoundedPairs, Dedup}

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < maxDocId)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = docs.select(col("doc_id").as("id"),
      Dedup.shingles(col("text"), 1).as("sh"))
    val nTrue = BoundedPairs.allPairs(base, "id")
      .filter(Dedup.jaccard(col("sh_a"), col("sh_b")) >= 0.9)
      .count()
    require(nTrue > 0, s"no true near-dup pairs in docs<=$maxDocId of " +
      s"$sfDir — recall is undefined; widen the slice")
    println(s"docs<=$maxDocId truePairs=$nTrue (exact Jaccard >= 0.9)")
    println(f"${"bands x rows"}%-14s ${"found"}%6s ${"recall"}%8s")
    bands.foreach { b =>
      val found = Dedup.lshNearDupPairs(docs, "text", "doc_id",
        shingleWidth = 1, numHashes = 24, numBands = b, threshold = 0.9)
        .count()
      println(f"${s"$b x ${24 / b}"}%-14s $found%6d ${found.toDouble / nTrue}%8.4f")
    }
    docs.unpersist()
    spark.stop()
  }
}
