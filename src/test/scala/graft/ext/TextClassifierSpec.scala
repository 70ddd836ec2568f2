package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  // tiny dim so bucket collisions are easy to reason about via the
  // same md5 arithmetic the operator uses
  private def bucketOf(s: String, dim: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % dim
  }

  test("score = sum of bucketed weights over unigrams + bigrams") {
    val dim = 8
    val weights = (0 until dim).map(i => (i * 10 + 1).toLong)
    val got = TextClassifier.score(
        Seq((1L, "a b c")).toDF("doc_id", "text"), "text", weights,
        thrNum = 0L, thrDen = 1L)
      .select(col("clf_sum"), col("clf_n"), col("clf_keep"))
      .as[(Long, Long, Boolean)].head()
    val feats = Seq("a", "b", "c", "a_b", "b_c")
    got._1 shouldBe feats.map(f => weights(bucketOf(f, dim).toInt)).sum
    got._2 shouldBe 5L
    got._3 shouldBe true
  }

  test("keep threshold is an integer cross-multiplication on the mean") {
    val dim = 4
    // every bucket weighs 7 → mean is exactly 7 for any doc
    val weights = Seq.fill(dim)(7L)
    def keepAt(num: Long, den: Long): Boolean =
      TextClassifier.score(Seq((1L, "x y z")).toDF("doc_id", "text"),
          "text", weights, num, den)
        .select(col("clf_keep")).as[Boolean].head()
    keepAt(7L, 1L) shouldBe true   // mean == threshold keeps
    keepAt(8L, 1L) shouldBe false
    keepAt(15L, 2L) shouldBe false // 7 < 7.5
    keepAt(13L, 2L) shouldBe true  // 7 > 6.5
  }

  test("single-token and empty docs score their unigram only") {
    val dim = 16
    val weights = (0 until dim).map(_.toLong + 1)
    val got = TextClassifier.score(
        Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text"), "text",
        weights, 0L, 1L)
      .select(col("doc_id"), col("clf_sum"), col("clf_n"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    got(0) shouldBe ((1L, weights(bucketOf("solo", dim).toInt), 1L))
    got(1) shouldBe ((2L, weights(bucketOf("", dim).toInt), 1L))
  }

  test("weight dim bounds are enforced") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      TextClassifier.score(df, "text", Seq.empty[Long], 0L, 1L)
    an[IllegalArgumentException] should be thrownBy
      TextClassifier.score(df, "text", Seq(1L), 0L, 0L)
  }

  test("the scoring scan is map-side — no exchange in the plan") {
    val plan = TextClassifier.score(
        Seq((1L, "a b")).toDF("doc_id", "text"), "text",
        Seq(1L, 2L, 3L, 4L), 0L, 1L)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("multiclass argmax, earlier-class ties, and margin") {
    // dim = 1: every feature lands in bucket 0, so a doc with n
    // features scores n * w_c[0] for class c — argmax and margin are
    // hand-computable regardless of hashing
    val classes = Seq("a" -> Seq(1L), "b" -> Seq(3L), "c" -> Seq(3L))
    val got = TextClassifier.scoreMulti(
        Seq((1L, "x y z")).toDF("doc_id", "text"), "text", classes)
      .select(col("clf_class"), col("clf_best"), col("clf_margin"),
        col("clf_n"))
      .as[(String, Long, Long, Long)].head()
    // "x y z" = 3 unigrams + 2 bigrams = 5 features; b and c tie at
    // 15 -> earlier class b wins with margin 0; runner-up is c
    got shouldBe (("b", 15L, 0L, 5L))
  }

  test("multiclass agrees with the binary head run per class") {
    val dim = 64
    val classes = Seq(
      "neg" -> (0 until dim).map(i => -(i.toLong % 7) - 1),
      "pos" -> (0 until dim).map(i => i.toLong % 5 + 1))
    val docs = Seq((1L, "the quick brown fox"), (2L, ""),
      (3L, "lorem ipsum dolor sit amet")).toDF("doc_id", "text")
    val multi = TextClassifier.scoreMulti(docs, "text", classes)
      .select(col("doc_id"), col("clf_class"), col("clf_best"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val perClass = classes.map { case (name, w) =>
      name -> TextClassifier.score(docs, "text", w, 0L, 1L)
        .select(col("doc_id"), col("clf_sum"))
        .as[(Long, Long)].collect().toMap
    }
    multi.foreach { case (id, cls, best) =>
      val scores = perClass.map { case (n, m) => (n, m(id)) }
      // tie impossible here (neg weights negative, pos positive)
      val expect = scores.maxBy(_._2)
      cls shouldBe expect._1
      best shouldBe expect._2
    }
  }

  test("multiclass input contracts are enforced") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      TextClassifier.scoreMulti(df, "text", Seq("only" -> Seq(1L)))
    an[IllegalArgumentException] should be thrownBy
      TextClassifier.scoreMulti(df, "text",
        Seq("a" -> Seq(1L), "b" -> Seq(1L, 2L)))
    an[IllegalArgumentException] should be thrownBy
      TextClassifier.scoreMulti(df, "text",
        Seq("a" -> Seq(1L), "a" -> Seq(2L)))
  }

  test("the multiclass scan is map-side — no exchange in the plan") {
    val plan = TextClassifier.scoreMulti(
        Seq((1L, "a b")).toDF("doc_id", "text"), "text",
        Seq("x" -> Seq(1L, 2L), "y" -> Seq(3L, 4L)))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
