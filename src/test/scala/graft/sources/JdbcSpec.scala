package graft.sources

import graft.SparkSpec
import graft.sinks.{History, JdbcHistory}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** External-JDBC path (S7 read / K5 sink) round-tripped through
  * embedded Derby — the sandbox stand-in for the reference's SQLite
  * file (`plotting_impl.py:109-121`, `builtin_recorders.py:56-193`).
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("write then read a table round-trips") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "v")
    Jdbc.write(df, url, "t_roundtrip", SaveMode.Overwrite)
    val back = Jdbc.read(spark, url, "t_roundtrip")
    back.count() shouldBe 3
    back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq shouldBe Seq((1L, "a"), (2L, "b"), (3L, "c"))
  }

  test("readQuery pushes arbitrary SQL to the database") {
    val df = (1 to 100).map(i => (i.toLong, i % 5)).toDF("id", "grp")
    Jdbc.write(df, url, "t_query", SaveMode.Overwrite)
    // Spark's JDBC writer quotes column names, so Derby stores them
    // case-sensitive lowercase — raw SQL must quote them back
    val agg = Jdbc.readQuery(spark, url,
      """SELECT "grp", count(*) AS n FROM t_query GROUP BY "grp"""")
    agg.count() shouldBe 5
    agg.agg(sum("n")).as[Long].head() shouldBe 100L
  }

  test("partitioned read issues parallel range scans") {
    val df = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("id", "name")
    Jdbc.write(df, url, "t_part", SaveMode.Overwrite)
    val part = Jdbc.read(spark, url, "t_part",
      Some(Jdbc.Partitioning("id", 1L, 1000L, 4)))
    part.rdd.getNumPartitions shouldBe 4
    part.count() shouldBe 1000
    // no rows lost at the range boundaries
    part.agg(sum("id")).as[Long].head() shouldBe 500500L
  }

  test("JdbcHistory batches enqueues and reads back recency-ordered") {
    val sink = new JdbcHistory(spark, url, "t_history", batchSize = 10)
    (1 to 25).foreach { i =>
      sink.enqueue(History.Record(
        ts = f"2026-01-01 00:00:$i%02d", run_id = "r1", phase = "inline",
        path = s"p/$i", processor = "proc", status = "ok",
        duration_ms = i.toLong, rows = 1L, error = ""))
    }
    sink.pending shouldBe 5 // two auto-flushes at 10, 5 still queued
    sink.flush()
    sink.pending shouldBe 0
    sink.all().count() shouldBe 25
    sink.recent(1).select("duration_ms").as[Long].head() shouldBe 25L
  }

  test("JdbcHistory.writeEpoch is idempotent under epoch replay") {
    // foreachBatch re-delivers an epoch on retry; the epoch-keyed
    // delete-then-append converges to ONE copy per delivery instead of
    // accumulating appends (the parquet face's epoch=N overwrite dirs,
    // in JDBC form)
    val sink = new JdbcHistory(spark, url, "t_epoch_hist")
    def batch(n: Int) = spark.range(n).selectExpr(
      "cast('2026-01-01' as string) ts", "'r1' run_id", "'inline' phase",
      "concat('p/', id) path", "'proc' processor", "'ok' status",
      "id duration_ms", "1L rows", "'' error")
    sink.writeEpoch(batch(7), epoch = 0)
    sink.writeEpoch(batch(7), epoch = 0) // replayed epoch
    sink.writeEpoch(batch(4), epoch = 1)
    sink.all().count() shouldBe 11 // 7 + 4, not 18
    sink.all().where("epoch = 0").count() shouldBe 7
  }
}
