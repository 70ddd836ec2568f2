package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: single-node throughput comparison against the reference's
  * pandas engine on IDENTICAL replicated data (BASELINE.md "Reference
  * throughput" section). Replicates the sf0.1 tables N× with
  * explode(sequence(...)) so Spark gets the same row multiset the
  * pandas side builds with pd.concat([df]*N).
  */
object CrossoverBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val rows = f
      println(f"$tag%-28s ${(System.nanoTime()-t0)/1e9}%7.3f s  ($rows rows)")
    }
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select("l_shipdate", "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
      .withColumn("rep", explode(sequence(lit(1), lit(n)))).drop("rep")
      // one row group otherwise serializes everything: spread the
      // replicated rows the way a real N×-bigger table would be laid out
      .repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time(s"spark ${n}x materialize")(li.count())
    time(s"spark ${n}x q1-shape") {
      li.filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice"),
             avg("l_quantity"), count(lit(1))).count()
    }
    time(s"spark ${n}x q1-shape warm") {
      li.filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice"),
             avg("l_quantity"), count(lit(1))).count()
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
      .withColumn("rep", explode(sequence(lit(1), lit(n)))).drop("rep")
      .repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time(s"spark ${n}x docs materialize")(docs.count())
    time(s"spark ${n}x md5 dedup") {
      docs.groupBy(md5(col("text"))).agg(min("doc_id"), count(lit(1))).count()
    }
    spark.stop()
  }
}
