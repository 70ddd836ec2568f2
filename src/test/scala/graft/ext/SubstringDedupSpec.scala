package graft.ext

import graft.SparkSpec
import graft.functions.{WindowHashFunctions, WindowHashOps}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Substring-level exact dedup: the window-hash arithmetic (rolling
  * update ≡ the oracle's plain fold), the span-removal sweep, and the
  * keep-one-in-minimum-doc election end to end on a hand-built corpus
  * where the expected removals are enumerable by eye.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val M = 2147483647L

  private def tokenHash(t: String, mul: Long): Long =
    t.foldLeft(0L)((h, c) => (h * mul + c) % M)

  /** The oracle's plain two-lane fold, packed — the spec's
    * independent reference.
    */
  private def foldWindow(toks: Seq[String]): Long = {
    val w1 = toks.map(tokenHash(_, 31L))
      .foldLeft(0L)((h, t) => (h * WindowHashOps.Base + t) % M)
    val w2 = toks.map(tokenHash(_, WindowHashOps.CharMul2))
      .foldLeft(0L)((h, t) => (h * WindowHashOps.Base2 + t) % M)
    (w1 << 31) + w2
  }

  test("windowHashes: rolling update equals the plain fold per window; " +
       "short docs yield none; empty tokens participate") {
    val text = "a bb ccc a bb  dd a"
    val toks = text.split(" ", -1).toSeq // 8 tokens incl. one empty
    val k = 3
    val got = WindowHashOps.windowHashes(UTF8String.fromString(text), k)
    got.numElements() shouldBe toks.length - k + 1
    (0 until got.numElements()).foreach { i =>
      got.getLong(i) shouldBe foldWindow(toks.slice(i, i + k))
    }
    // fewer than k tokens -> empty array
    WindowHashOps.windowHashes(UTF8String.fromString("a b"), 3)
      .numElements() shouldBe 0
    // k == n -> exactly one window
    WindowHashOps.windowHashes(UTF8String.fromString("a b c"), 3)
      .numElements() shouldBe 1
  }

  test("windowHashes via the Column face: codegen'd plan, same values") {
    val df = Seq("x y z x y z", "one two").toDF("text")
    val rows = df.select(WindowHashFunctions.tokenWindowHashes(col("text"), 3)
      .as("wh")).collect()
    val first = rows(0).getSeq[Long](0)
    first should have size 4
    // repeated 3-gram "x y z" at positions 0 and 3 -> equal hashes
    first(0) shouldBe first(3)
    first(0) shouldBe foldWindow(Seq("x", "y", "z"))
    rows(1).getSeq[Long](0) shouldBe empty
  }

  test("removeSpans: overlapping spans merge in one sweep; unsorted " +
       "starts handled; full scrub yields empty text") {
    def rm(text: String, starts: Seq[Long], k: Int) = {
      val r = WindowHashOps.removeSpans(UTF8String.fromString(text),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          starts.toArray[Any]), k)
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
    }
    // tokens: t0..t9; spans [2,5) and [4,7) merge into [2,7)
    val text = (0 until 10).map(i => s"t$i").mkString(" ")
    rm(text, Seq(4L, 2L), 3) shouldBe ("t0 t1 t7 t8 t9", 10L, 5L)
    // disjoint spans
    rm(text, Seq(0L, 7L), 2) shouldBe ("t2 t3 t4 t5 t6 t9", 10L, 4L)
    // no spans: exact round-trip (incl. consecutive-space empty tokens)
    rm("a  b", Nil, 2) shouldBe ("a  b", 3L, 0L)
    // everything covered
    rm("a b c", Seq(0L), 3) shouldBe ("", 3L, 3L)
  }

  test("dedup: cross-doc duplicate spans scrubbed from every doc but " +
       "the minimum id; within-doc repeats untouched") {
    val boiler = "q w e r t y u i" // 8 tokens = one full window at k=8
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma"),       // min id: keeps boiler
      (2L, s"$boiler delta"),                  // scrubbed at pos 0
      (3L, s"x1 x2 x3 $boiler"),               // scrubbed at pos 3
      (4L, "solo a b c a b c a b c a b c"),    // within-doc repeats only
      (5L, "tiny")                             // < k tokens
    ).toDF("doc_id", "text")
    val out = SubstringDedup.dedup(docs, "text", "doc_id", k = 8)
      .orderBy("doc_id")
      .select("doc_id", "clean_text", "n_tokens", "removed_windows",
        "removed_tokens")
      .as[(Long, String, Long, Long, Long)].collect()
    out(0) shouldBe ((1L, s"alpha beta $boiler gamma", 11L, 0L, 0L))
    out(1) shouldBe ((2L, "delta", 9L, 1L, 8L))
    out(2) shouldBe ((3L, "x1 x2 x3", 11L, 1L, 8L))
    // within-doc repetition is NOT this operator's scope
    out(3) shouldBe ((4L, "solo a b c a b c a b c a b c", 13L, 0L, 0L))
    out(4) shouldBe ((5L, "tiny", 1L, 0L, 0L))
  }

  test("dedup: overlapping duplicate windows from a long shared run " +
       "merge into one removed span; audit frame matches") {
    // a 12-token shared run at k=8 -> 5 duplicate windows in doc 2,
    // overlapping into ONE removed 12-token span
    val run = (0 until 12).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (10L, s"$run tail0"),
      (20L, s"head0 head1 $run")
    ).toDF("doc_id", "text")
    val starts = SubstringDedup
      .removedWindowStarts(docs, "text", "doc_id", k = 8)
      .as[(Long, Seq[Long])].collect().toMap
    starts.keySet shouldBe Set(20L)
    starts(20L) shouldBe Seq(2L, 3L, 4L, 5L, 6L)
    val out = SubstringDedup.dedup(docs, "text", "doc_id", k = 8)
      .orderBy("doc_id").select("clean_text", "removed_tokens")
      .as[(String, Long)].collect()
    out(0) shouldBe ((s"$run tail0", 0L))
    out(1) shouldBe (("head0 head1", 12L))
  }

  test("k guard: k < 2 is refused loudly") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val e = the[IllegalArgumentException] thrownBy
      SubstringDedup.dedup(docs, "text", "doc_id", k = 1)
    e.getMessage should include("k >= 2")
  }
}
