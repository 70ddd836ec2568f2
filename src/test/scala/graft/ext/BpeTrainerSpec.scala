package graft.ext

import graft.SparkSpec
import graft.functions.{BpeModel, BpeSegment}
import org.apache.spark.sql.functions._

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("learns the hand-computable merges of a tiny corpus") {
    // corpus: "low low low lower lower newest newest newest newest"
    //   words: low×3, lower×2, newest×4
    // iteration 1 pair counts: (l,o)=5 (o,w)=5 (w,e)=2+4=6 (e,r)=2
    //   (n,e)=4 (e,w)=4 (e,s)=4 (s,t)=4  → argmax (w,e) c=6
    val docs = Seq("low low low lower lower",
      "newest newest newest newest").toDF("text")
    val m = BpeTrainer.train(docs, "text", nMerges = 3)
    m.head shouldBe BpeTrainer.Merge("w", "e", 6L)
    // after (w,e): low→[l,o,w]×3, lower→[l,o,we,r]×2,
    //   newest→[n,e,we,s,t]×4; counts: (l,o)=5 (o,w)=3 (o,we)=2
    //   (we,r)=2 (n,e)=4 (e,we)=4 (we,s)=4 (s,t)=4 → (l,o) c=5
    m(1) shouldBe BpeTrainer.Merge("l", "o", 5L)
    // after (l,o): (lo,w)=3 (lo,we)=2 (o? none) ... (n,e)=4 (e,we)=4
    //   (we,s)=4 (s,t)=4 → four-way tie at 4, lexicographic lhs,rhs:
    //   ("e","we") < ("n","e") < ("s","t") < ("we","s")
    m(2) shouldBe BpeTrainer.Merge("e", "we", 4L)
  }

  test("train-then-apply: learned table segments by reference min-rank semantics") {
    val docs = Seq("aaab aaab ab").toDF("text")
    val merges = BpeTrainer.mergeTable(BpeTrainer.train(docs, "text", 2))
    // pair counts round 1: (a,a)=4, (a,b)=3 → (a,a);
    //   aaab→[aa,a,b], ab→[a,b]: (aa,a)=2,(a,b)=3 → (a,b)
    merges shouldBe Seq("a" -> "a", "a" -> "b")
    // applying the learned table: min-rank on "aaab" = [aa, ab]
    val toks = Seq("aaab").toDF("t")
      .select(BpeSegment.tokens(col("t"), merges).as("tk"))
      .as[Seq[String]].head()
    toks shouldBe Seq("aa", "ab")
    // and the trained table is consistent — the Column fold accepts it
    noException should be thrownBy BpeTokenizer.validateMerges(merges)
  }

  test("stops early when nothing is left to merge") {
    val docs = Seq("ab ab").toDF("text")
    val m = BpeTrainer.train(docs, "text", nMerges = 10)
    // (a,b) merges once; then every word is a single token
    m.map(x => (x.lhs, x.rhs)) shouldBe Seq("a" -> "b")
  }

  test("trained tables round-trip through the persisted artifact") {
    val docs = Seq("low low low lower lower newest newest").toDF("text")
    val trained = BpeTrainer.train(docs, "text", nMerges = 3)
    val p = java.nio.file.Files.createTempDirectory("bpe_store_").toString + "/table"
    BpeTrainer.save(spark, p, trained)
    val loaded = BpeTrainer.load(spark, p)
    loaded shouldBe trained
    // torn artifact: a rank gap refuses loudly
    val torn = spark.read.parquet(p).filter(col("rank") =!= 1)
    torn.write.mode("overwrite").parquet(p + "_torn")
    an[IllegalArgumentException] should be thrownBy
      BpeTrainer.load(spark, p + "_torn")
    an[IllegalArgumentException] should be thrownBy
      BpeTrainer.save(spark, p + "_e", Seq.empty)
  }

  test("byte-level training learns merges over the mapped alphabet") {
    val sp = BpeModel.byteStr(' '.toInt)
    val docs = Seq("你你 你你 你你").toDF("text")
    val m = BpeTrainer.train(docs, "text", nMerges = 2, byteLevel = true)
    m should have size 2
    // every learned symbol is in the mapped (printable) alphabet —
    // single chars from byteToChar or concatenations thereof
    val alphabet = BpeModel.byteToChar.toSet
    m.foreach { mm =>
      (mm.lhs + mm.rhs).foreach(c => alphabet should contain(c))
    }
    // the first merge joins two bytes INSIDE 你 (count 6 across the
    // three words), never the rarer space-carry pair
    m.head.lhs should not be sp
    m.head.pairCount shouldBe 6L
  }
}
