package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._

/** Native MinHash expressions: bit-parity with the HOF formulations
  * they replaced, empty/null contracts, codegen activation.
  */
class MinHashExprsSpec extends SparkSpec {
  import spark.implicits._

  /** The replaced HOF formulations — parity references. */
  private def hofHexHash(arr: org.apache.spark.sql.Column, salt: String) =
    transform(arr, s =>
      conv(substring(md5(concat(lit(salt), s)), 1, 13), 16, 10).cast("long"))

  private def hofMinhash(h1: org.apache.spark.sql.Column,
                         h2: org.apache.spark.sql.Column, num: Int) =
    array((0 until num).map { i =>
      array_min(zip_with(h1, h2, (a, b) => a + lit(i.toLong) * b))
    }: _*)

  private val docs = Seq(
    "the quick brown fox",
    "a a b",
    "",
    "unicode caffè naïve 中文")
    .toDF("text")
    .select(array_distinct(split(col("text"), " ")).as("sh"))

  test("hex_hash_array matches the md5/conv formulation bit-for-bit") {
    for (salt <- Seq("a#", "b#", "")) {
      val got = docs.select(MinHashFunctions.hexHashArray(col("sh"), salt))
        .collect().map(_.getSeq[Long](0))
      val want = docs.select(hofHexHash(col("sh"), salt))
        .collect().map(_.getSeq[Long](0))
      got.toSeq shouldBe want.toSeq
    }
  }

  test("minhash_array matches the zip_with/array_min battery") {
    val hashed = docs
      .select(MinHashFunctions.hexHashArray(col("sh"), "a#").as("h1"),
        MinHashFunctions.hexHashArray(col("sh"), "b#").as("h2"))
    val got = hashed.select(MinHashFunctions.minhashArray(col("h1"), col("h2"), 8))
      .collect().map(r => (0 until 8).map(i =>
        if (r.getSeq[Any](0)(i) == null) null else r.getSeq[Long](0)(i)))
    val want = hashed.select(hofMinhash(col("h1"), col("h2"), 8))
      .collect().map(r => (0 until 8).map(i =>
        if (r.getSeq[Any](0)(i) == null) null else r.getSeq[Long](0)(i)))
    got.toSeq shouldBe want.toSeq
  }

  test("empty shingle set yields all-null signature slots") {
    val row = Seq(Seq.empty[String]).toDF("sh")
      .select(MinHashFunctions.minhashArray(
        MinHashFunctions.hexHashArray(col("sh"), "a#"),
        MinHashFunctions.hexHashArray(col("sh"), "b#"), 4))
      .collect().head
    row.getSeq[Any](0) shouldBe Seq(null, null, null, null)
  }

  test("hashes stay in 52 bits (band-hash headroom)") {
    val maxHash = docs.filter(F.size(col("sh")) > 0)
      .select(explode(MinHashFunctions.hexHashArray(col("sh"), "a#")).as("h"))
      .agg(max(col("h"))).as[Long].head()
    maxHash should be < (1L << 52)
    maxHash should be > 0L
  }

  test("plan stays inside whole-stage codegen") {
    val df = spark.range(10)
      .select(split(concat_ws(" ", lit("w"), col("id").cast("string")), " ").as("sh"))
      .select(MinHashFunctions.minhashArray(
        MinHashFunctions.hexHashArray(col("sh"), "a#"),
        MinHashFunctions.hexHashArray(col("sh"), "b#"), 4).as("sig"))
    df.queryExecution.executedPlan.toString should include("*(1) Project [minhash_array")
    df.collect().length shouldBe 10
  }
}
