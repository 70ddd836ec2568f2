package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    ParagraphDedup.dedup(rows.toDF("doc_id", "text"), "text", "doc_id")
      .select(col("doc_id"), col("n_paras"), col("removed_paras"),
        col("clean_text"))
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)

  test("min-id document keeps the shared paragraph; every later doc loses it") {
    val boiler = "This work is licensed under the corpus license."
    val got = run(
      (3L, s"unique three\n\n$boiler"),
      (1L, s"unique one\n\n$boiler"),
      (2L, s"$boiler\n\nunique two"))
    got(0) shouldBe ((1L, 2, 0, s"unique one\n\n$boiler"))
    got(1) shouldBe ((2L, 2, 1, "unique two"))
    got(2) shouldBe ((3L, 2, 1, "unique three"))
  }

  test("owner keeps ALL its occurrences; non-owners lose all of theirs") {
    val p = "repeated block"
    val got = run(
      (1L, s"$p\n\nmiddle\n\n$p"),
      (2L, s"$p\n\nother\n\n$p"))
    got(0) shouldBe ((1L, 3, 0, s"$p\n\nmiddle\n\n$p"))
    got(1) shouldBe ((2L, 3, 2, "other"))
  }

  test("empty split blocks never participate and survive in place") {
    // three consecutive newlines: "a\n\n\nb" splits to ["a", "\nb"];
    // four split to ["a", "", "b"] — the empty block must pass through
    val got = run(
      (1L, "a\n\n\n\nb"),
      (2L, "a\n\nc"))
    got(0)._2 shouldBe 3
    got(0)._4 shouldBe "a\n\n\n\nb"
    // doc 2 loses "a" (owned by doc 1)
    got(1) shouldBe ((2L, 2, 1, "c"))
  }

  test("doc-level exact dup degenerates correctly: later twin empties out") {
    val got = run((1L, "same single paragraph"), (2L, "same single paragraph"))
    got(0) shouldBe ((1L, 1, 0, "same single paragraph"))
    got(1) shouldBe ((2L, 1, 1, ""))
  }

  test("untouched documents round-trip byte-identically") {
    val texts = Seq(
      (10L, "alpha\n\nbeta\n\ngamma"),
      (11L, "delta only"),
      (12L, "eps\n\n\n\n\n\nzeta"))
    val got = run(texts: _*)
    got.map(r => (r._1, r._4)) shouldBe texts.sortBy(_._1)
    all(got.map(_._3)) shouldBe 0
  }

  test("election shuffles hashes only: no text column below the first exchange") {
    val docs = Seq((1L, "a\n\nb"), (2L, "b\n\nc")).toDF("doc_id", "text")
    // AQE off so the exchanges are inspectable in the executed plan
    // (the same shape runs under AQE — this pins the static plan)
    withConfs("spark.sql.adaptive.enabled" -> "false") {
      val out = ParagraphDedup.dedup(docs, "text", "doc_id")
      // the aggregate side of the election must project (id, pos, ph)
      // before its exchange — no election exchange may carry the text
      val election = out.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.child.output.exists(a => a.name == "ph" || a.name == "pos") => e
      }
      election should not be empty
      election.foreach { e =>
        val names = e.child.output.map(_.name)
        names should not contain "para"
        names should not contain "text"
      }
    }
  }
}
