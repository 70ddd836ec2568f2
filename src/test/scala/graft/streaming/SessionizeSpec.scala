package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import Sessionize._

/** Typed sessionization: batch flatMapGroups semantics and the
  * streaming flatMapGroupsWithState variant (completed sessions emit
  * when the next session opens; the open session stays in state).
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("batch sessions split at gaps, ordered by event_id") {
    val df = Seq(
      (1L, 10L, 0L), (1L, 11L, 100L), (1L, 12L, 5000L),
      (2L, 20L, 0L)
    ).toDF("user_id", "event_id", "ts")
      .withColumn("ts", $"ts".cast("timestamp"))
    val out = sessionsBatch(df, gapSecs = 1800).collect()
      .sortBy(s => (s.user_id, s.session_idx))
    out shouldBe Array(
      Session(1L, 1L, 2L, 10L, 11L),
      Session(1L, 2L, 1L, 12L, 12L),
      Session(2L, 1L, 1L, 20L, 20L))
  }

  test("streaming state emits completed sessions across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = sessionsStreaming(ms.toDS(), gapSecs = 10)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    try {
      ms.addData(Event(1L, 1L, 0L), Event(1L, 2L, 5L))
      q.processAllAvailable()
      spark.table("sess_test").count() shouldBe 0 // session still open

      ms.addData(Event(1L, 3L, 100L)) // gap > 10 closes session 1
      q.processAllAvailable()
      val rows = spark.table("sess_test").as[Session].collect()
      rows shouldBe Array(Session(1L, 1L, 2L, 1L, 2L))

      ms.addData(Event(1L, 4L, 500L)) // closes session 2 (event 3)
      q.processAllAvailable()
      spark.table("sess_test").as[Session].collect()
        .sortBy(_.session_idx) shouldBe Array(
        Session(1L, 1L, 2L, 1L, 2L),
        Session(1L, 2L, 1L, 3L, 3L))
    } finally q.stop()
  }
}
