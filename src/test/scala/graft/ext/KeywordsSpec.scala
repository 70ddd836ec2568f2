package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana cherry cherry date"),
    (3L, "apple date date date egg"),
    (4L, "fig fig fig fig"),
    (5L, "apple banana cherry date egg fig")
  ).toDF("doc_id", "text")

  test("equals the window-function formulation exactly") {
    val got = Keywords.tfidfTopK(docs, "text", "doc_id", k = 2)
      .select("doc_id", "term", "tf", "df", "score_q")
    val terms = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("score_q"), asc("term"))
    val want = tf.join(dfreq, "term")
      .withColumn("score_q",
        call_function("div", col("tf") * lit(Keywords.Scale), col("df")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("doc_id", "term", "tf", "df", "score_q")
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
    got.count() shouldBe want.count()
  }

  test("fixed-point score is exact integer arithmetic") {
    val rows = Keywords.tfidfTopK(docs, "text", "doc_id", k = 10)
      .select("tf", "df", "score_q")
      .as[(Long, Long, Long)].collect()
    rows should not be empty
    rows.foreach { case (tf, df, s) =>
      s shouldBe (tf * Keywords.Scale) / df
    }
  }

  test("rare terms outrank common ones at equal tf") {
    // doc 5 has every term once; 'egg' (df=2) must outrank 'cherry' (df=3)
    val top = Keywords.tfidfTopK(docs, "text", "doc_id", k = 2)
      .filter(col("doc_id") === 5L)
      .select("term").as[String].collect().toSet
    top should contain("egg")
    top should not contain "cherry"
  }

  test("plan: per-doc top-k runs through the TopKPerKey operator, df join broadcasts") {
    val plan = Keywords.tfidfTopK(docs, "text", "doc_id", k = 3)
      .queryExecution.executedPlan.toString
    plan should include("TopKPerKey")
    plan should include("BroadcastHashJoin")
  }

  test("broadcastDf=false shuffles the df join but returns identical rows") {
    val a = Keywords.tfidfTopK(docs, "text", "doc_id", k = 2)
    val b = Keywords.tfidfTopK(docs, "text", "doc_id", k = 2,
      broadcastDf = false)
    a.except(b).count() shouldBe 0L
    b.except(a).count() shouldBe 0L
  }

  test("k guard") {
    an[IllegalArgumentException] should be thrownBy
      Keywords.tfidfTopK(docs, "text", "doc_id", k = 0)
  }
}
