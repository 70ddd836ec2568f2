package graft.sinks

import graft.SparkSpec
import java.nio.file.Files

/** Exporter round-trips + history-sink batching semantics (reference
  * `test/test_builtin_recorders.py`: enqueue, flush, batch threshold,
  * read-back).
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(name).resolve("out").toString

  test("csv/json/parquet round-trips preserve rows") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "tag")
    val p1 = tmp("csv"); Exporters.csv(df, p1)
    spark.read.option("header", "true").csv(p1).count() shouldBe 2
    val p2 = tmp("json"); Exporters.json(df, p2)
    spark.read.json(p2).count() shouldBe 2
    val p3 = tmp("parquet"); Exporters.parquet(df, p3)
    spark.read.parquet(p3).count() shouldBe 2
  }

  test("cached builds once and reloads thereafter") {
    val dir = Files.createTempDirectory("cache").toString
    var builds = 0
    def build = { builds += 1; Seq((1, "x")).toDF("id", "t") }
    Exporters.cached(spark, dir, "k1")(build).count() shouldBe 1
    Exporters.cached(spark, dir, "k1")(build).count() shouldBe 1
    builds shouldBe 1
  }

  test("partitioned write prunes partitions on tag-selector reads") {
    val df = Seq(("src0", 1, "a"), ("src0", 2, "b"), ("src1", 3, "c"))
      .toDF("source", "id", "payload")
    val p = tmp("part")
    Exporters.partitionedParquet(df, p, Seq("source"))
    val read = spark.read.parquet(p).filter($"source" === "src1")
    read.count() shouldBe 1
    // the physical scan must carry the partition filter (pruning), not
    // a post-scan row filter over all directories
    val plan = read.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("src1")
  }

  test("writeEpoch DELETE probing only swallows identifier-resolution SQLStates") {
    import java.sql.SQLException
    def cls(state: String) =
      JdbcHistory.identifierResolutionFailure(new SQLException("m", state))
    // class 42 = wrong quoting variant → try the next one
    cls("42X05") shouldBe true // Derby: table does not exist
    cls("42X04") shouldBe true // Derby: column not in any table
    cls("42S02") shouldBe true // SQL-92: base table not found
    cls("42P01") shouldBe true // Postgres: undefined table
    // a null/empty state is indeterminate (SQLite's driver reports
    // missing tables with no SQLState) → keep probing; the
    // table-existence metadata check after the loop is the authority
    JdbcHistory.identifierResolutionFailure(
      new SQLException("no such table")) shouldBe true
    cls("") shouldBe true
    // a KNOWN non-42 state is a real error on a possibly-correct
    // variant → must rethrow as itself, not escalate to
    // refuse-to-append
    cls("40XL1") shouldBe false // Derby: lock timeout
    cls("40001") shouldBe false // serialization failure / deadlock
    cls("08006") shouldBe false // connection failure
  }

  test("history enqueues, auto-flushes at batch size, reads back recent") {
    val path = tmp("history")
    val h = new History(spark, path, batchSize = 5)
    def rec(i: Int) = History.Record(f"2026-01-01T00:00:$i%02d", "r1", "inline",
      s"p$i", "proc", "ok", i.toLong, 1L, "")
    (1 to 4).foreach(i => h.enqueue(rec(i)))
    h.pending shouldBe 4                       // below threshold: queued
    h.enqueue(rec(5))
    h.pending shouldBe 0                       // threshold hit: flushed
    (6 to 7).foreach(i => h.enqueue(rec(i)))
    h.flush()                                  // explicit drain
    h.all().count() shouldBe 7
    h.recent(2).select("path").as[String].collect().toSet shouldBe Set("p6", "p7")
  }
}
