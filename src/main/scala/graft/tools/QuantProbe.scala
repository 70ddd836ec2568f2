package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decompose the qbrute-vs-brute gap at 8 M vectors (ScaleTrend r17:
  * int8 search 66 s vs float 36 s despite 3.5× less IO — 100 k shows
  * the OPPOSITE, 0.8 vs 2.5 s). Times each stage in isolation over the
  * cached fixtures: bare scans, dot-only scoring, full cosine scoring,
  * and the top-k window, for both payloads.
  *
  * Usage: QuantProbe [n]   (default 8000000; fixtures must exist —
  * run `ScaleTrend 100 <n> qbrute` once first)
  */
object QuantProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fv = spark.read.parquet(s"$out/vecs_${n}_v1")
    val qv = spark.read.parquet(s"$out/qvecs_${n}_v1")

    def t(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    t("scan float")(fv.select(sum(size(col("embedding")))).head.getLong(0))
    t("scan int8")(qv.select(sum(size(col("q_vec")))).head.getLong(0))

    val fq = fv.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("q_vec_f"))
    val qq = qv.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("q_vec").as("qq"))

    t("float dot only")(fv.crossJoin(broadcast(fq))
      .select(sum(graft.functions.DotProduct.dot(
        col("embedding").cast("array<double>"),
        col("q_vec_f").cast("array<double>"))).cast("long")).head.getLong(0))
    t("int8 qdot only")(qv.crossJoin(broadcast(qq))
      .select(sum(graft.ext.Quantize.qdot(col("q_vec"), col("qq"))))
      .head.getLong(0))

    t("float cosine")(fv.crossJoin(broadcast(fq))
      .select(sum(graft.ext.Similarity.cosine(col("embedding"),
        col("q_vec_f")) * 1e6).cast("long")).head.getLong(0))
    t("int8 qcosine")(qv.crossJoin(broadcast(qq))
      .select(sum(graft.ext.Quantize.quantizedCosine(col("q_vec"),
        col("qq")) * 1e6).cast("long")).head.getLong(0))

    t("brute full")(graft.ext.Similarity.bruteForceKnn(
      fv, fv.filter(col("vec_id") < 20), k = 10).count())
    t("qbrute full")(graft.ext.Quantize.bruteForceKnnQuantized(
      qv, qv.filter(col("vec_id") < 20), k = 10,
      preQuantized = true).count())
    spark.stop()
  }
}
