package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  private val merges = Seq(
    "a" -> "n", "e" -> "r", "s" -> "c", "sc" -> "an", "o" -> "r",
    "t" -> "a", "r" -> "o", "h" -> "a", "ha" -> "s")

  private def toks(text: String, m: Seq[(String, String)] = merges): Seq[String] =
    Seq(text).toDF("t")
      .select(BpeTokenizer.tokens(col("t"), m).as("tk"))
      .as[Seq[String]].head()

  private def cnt(text: String): Long =
    Seq(text).toDF("t")
      .select(BpeTokenizer.tokenCount(col("t"), merges))
      .as[Long].head()

  test("multi-level merges collapse a word to one token") {
    // scan: s,c,a,n → (a,n) → s,c,an → (s,c) → sc,an → (sc,an) → scan
    toks("scan") shouldBe Seq("scan")
  }

  test("partial segmentation follows rank order") {
    // order: o,r,d,e,r → (e,r) fires BEFORE (o,r) by rank → or,d,er
    toks("order") shouldBe Seq("or", "d", "er")
    // hash: h,a,s,h → (h,a) → ha,s,h → (ha,s) → has,h
    toks("hash") shouldBe Seq("has", "h")
    // untouched word stays fully character-split
    toks("dup") shouldBe Seq("d", "u", "p")
  }

  test("merges never cross token boundaries (the r17 bug class)") {
    // tan: (a,n) r0 fires → [t, an]; (t,a) r5 must NOT match the
    // prefix of token "an" — the old single-space separator let
    // 't a' match 't an' and emitted ["tan"]
    toks("tan") shouldBe Seq("t", "an")
    toks("than") shouldBe Seq("t", "h", "an")
    toks("stan") shouldBe Seq("s", "t", "an")
    toks("chan") shouldBe Seq("c", "h", "an")
    // han: (a,n) r0 beats (h,a) r7 — and once "an" exists, (h,a)
    // has no bare "a" left to bind
    toks("han") shouldBe Seq("h", "an")
  }

  test("leftmost-first non-overlapping merge of repeated pairs") {
    // aaa with (a,a): leftmost pair merges, third a survives
    toks("aaa", Seq("a" -> "a")) shouldBe Seq("aa", "a")
    // aaaa: two disjoint leftmost merges
    toks("aaaa", Seq("a" -> "a")) shouldBe Seq("aa", "aa")
  }

  test("documents segment word-by-word; counts match the token array") {
    val text = "scan order hash"
    toks(text) shouldBe Seq("scan", "or", "d", "er", "has", "h")
    cnt(text) shouldBe 6L
    cnt("") shouldBe 0L
    toks("") shouldBe Seq.empty
  }

  test("inconsistent merge tables are rejected loudly") {
    // "xy" is not a single char and no earlier merge produced it
    an[IllegalArgumentException] should be thrownBy
      BpeTokenizer.validateMerges(Seq("xy" -> "z"))
    // space inside a symbol breaks the word pretokenizer
    an[IllegalArgumentException] should be thrownBy
      BpeTokenizer.validateMerges(Seq("a " -> "b"))
    // boundary sentinels inside a symbol break the working string
    an[IllegalArgumentException] should be thrownBy
      BpeTokenizer.validateMerges(Seq(("a" + BpeTokenizer.Open) -> "b"))
    an[IllegalArgumentException] should be thrownBy
      BpeTokenizer.validateMerges(Seq("a" -> (BpeTokenizer.Close + "b")))
    an[IllegalArgumentException] should be thrownBy
      BpeTokenizer.validateMerges(Seq.empty)
    // the gate's table IS consistent
    noException should be thrownBy BpeTokenizer.validateMerges(merges)
  }

  test("the tokenizer is a pure map-side scan — no exchange") {
    val plan = Seq("a b").toDF("t")
      .select(BpeTokenizer.tokenCount(col("t"), merges))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
