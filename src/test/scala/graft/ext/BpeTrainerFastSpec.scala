package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[BpeTrainer.trainFast]] (incremental pair-count update, one
  * Spark job total) EXACTLY equal to [[BpeTrainer.train]] (per-merge
  * vocab recount) — merges, ranks AND pair counts — on hand-computed,
  * random, and byte-level corpora; plus the vocab guard.
  */
class BpeTrainerFastSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed corpus: fast ≡ per-iteration recount") {
    val docs = Seq("low low low lower lower",
      "newest newest newest newest").toDF("text")
    val slow = BpeTrainer.train(docs, "text", nMerges = 3)
    val fast = BpeTrainer.trainFast(docs, "text", nMerges = 3)
    fast shouldBe slow
    fast.head shouldBe BpeTrainer.Merge("w", "e", 6L)
  }

  test("random corpora: fast ≡ recount on merges, ranks and counts") {
    (1L to 4L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // small alphabet + Zipf-ish repetition so ties and overlapping
      // pairs (aa/aaa) actually occur
      val words = (1 to 120).map(_ =>
        (1 to (1 + rnd.nextInt(8)))
          .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
      val docs = (1 to 40).map(_ =>
        (1 to (3 + rnd.nextInt(10)))
          .map(_ => words(rnd.nextInt(words.size))).mkString(" "))
        .toDF("text")
      val n = 25
      val slow = BpeTrainer.train(docs, "text", n)
      val fast = BpeTrainer.trainFast(docs, "text", n)
      withClue(s"seed $seed: ") { fast shouldBe slow }
      // trained tables are consistent — the Column fold accepts them
      noException should be thrownBy
        BpeTokenizer.validateMerges(BpeTrainer.mergeTable(fast))
    }
  }

  test("early exhaustion and single-token words match") {
    val docs = Seq("ab ab").toDF("text")
    BpeTrainer.trainFast(docs, "text", 10) shouldBe
      BpeTrainer.train(docs, "text", 10)
  }

  test("byte-level corpora: fast ≡ recount over the mapped alphabet") {
    val docs = Seq("你你 你你 你你 don't 2024").toDF("text")
    val slow = BpeTrainer.train(docs, "text", 6, byteLevel = true)
    val fast = BpeTrainer.trainFast(docs, "text", 6, byteLevel = true)
    fast shouldBe slow
  }

  test("vocab guard throws loudly past maxVocab") {
    val docs = (1 to 50).map(i => s"w$i").toDF("text")
    an[IllegalArgumentException] should be thrownBy
      BpeTrainer.trainFast(docs, "text", 2, maxVocab = 10)
    // and at the boundary it still trains
    noException should be thrownBy
      BpeTrainer.trainFast(docs, "text", 1, maxVocab = 50)
  }

  test("deep merge chains (overlapping runs) match the recount") {
    // aaaa… runs: (a,a) → aa, then (aa,a)/(aa,aa) chains — the
    // overlapping-occurrence and chained-output cases where an
    // incremental update is easiest to get wrong
    val docs = Seq("aaaaaaaa aaaa aaa aa a",
      "aaaaaaaa aaaa aaa", "baab baab aab").toDF("text")
    val slow = BpeTrainer.train(docs, "text", 8)
    val fast = BpeTrainer.trainFast(docs, "text", 8)
    fast shouldBe slow
  }
}
