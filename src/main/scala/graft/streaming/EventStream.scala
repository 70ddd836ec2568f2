package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (SURVEY.md §2.10 — the
  * reference is batch-only; this is the declared extension: the same
  * engine should drive continuous event pipelines).
  *
  * The file source replays the parquet directory as a stream; the same
  * code pointed at a live directory/Kafka source runs unmodified. The
  * `availableNow` trigger processes the whole backlog as micro-batches
  * and terminates — which is how a batch harness can exercise a genuine
  * streaming plan (stateful aggregation, watermarks, memory sink).
  */
object EventStream {

  /** The events schema for the streaming source, minus `ts`, whose
    * physical type varies by generator version (see [[readEvents]]).
    */
  private def rawSchema(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of `<sfDir>/events.parquet`.
    *
    * The streaming file source needs an explicit schema, and `ts` has
    * been written two ways across generator versions — TIMESTAMP(NANOS)
    * (readable only as a raw long via `nanosAsLong`, rebuilt with
    * integer `div`) and timezone-less TIMESTAMP(MICROS) (inferred as
    * TIMESTAMP_NTZ). One batch footer read resolves which file layout
    * is present (metadata-only — no data scan), and both normalize to
    * session-timezone `timestamp`, value-preserving under the pinned
    * UTC session.
    */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(s"$sfDir/events.parquet")
      .schema("ts").dataType
    val stream = spark.readStream
      .schema(rawSchema(tsType))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    tsType match {
      case LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => stream
      case TimestampNTZType =>
        stream.withColumn("ts", col("ts").cast("timestamp"))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported physical type $other — known " +
          "layouts are nanos-as-long and TIMESTAMP(_NTZ) micros")
    }
  }

  /** Tumbling-window aggregation with a watermark: events per hour ×
    * type, decimal value sums (order-independent). At scale this is the
    * canonical shuffle-on-(window,type) stateful agg; the watermark
    * bounds state.
    */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("value").cast("decimal(18,6)")), 2).cast("double")
             .as("total_v"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("total_v"))

  /** Run a streaming aggregation to completion over the current backlog
    * and return the result as a batch frame (memory sink, complete
    * mode — append would withhold windows still inside the watermark).
    */
  def runToCompletion(spark: SparkSession, agg: DataFrame,
                      name: String): DataFrame =
    runBacklog(spark, agg, name, "complete")

  // shared memory-sink/AvailableNow runner behind both completion
  // faces — one place for the boilerplate the two modes have in common
  private def runBacklog(spark: SparkSession, agg: DataFrame,
                         name: String, mode: String): DataFrame = {
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Run a streaming aggregation over the current backlog in APPEND
    * mode and return the emitted rows — the DEPLOYMENT shape of
    * [[runToCompletion]]: the watermark closes windows, emits each
    * exactly once, and EVICTS its state (complete mode re-emits
    * everything every trigger and keeps all state forever — fine for
    * a replay gate, the state-store killer on an unbounded stream).
    * `availableNow` runs the extra no-new-data batch a stateful plan
    * requests after the final watermark advance, so every window
    * whose end ≤ final watermark (max event time − delay, floored to
    * the millisecond — pinned in StreamSinkSpec) is emitted; windows
    * still inside the horizon stay in state, unemitted — exactly the
    * rows a resumed incremental run would deliver next.
    */
  def runAppendToCompletion(spark: SparkSession, agg: DataFrame,
                            name: String): DataFrame =
    runBacklog(spark, agg, name, "append")

  /** Streaming exactly-once dedup — the streaming face of the dedup
    * family (✚): `dropDuplicatesWithinWatermark` keys state by the id
    * and EVICTS entries once the watermark passes them, so state is
    * bounded by the dedup horizon instead of growing with the stream
    * (plain `dropDuplicates` on an id column never evicts — the
    * 100 TB state-store killer). Duplicates arriving within
    * `horizon` of the first sighting are dropped; later re-sends are
    * treated as new, which is the standard at-least-once-source
    * contract.
    */
  def dedupEvents(events: DataFrame, idCol: String = "event_id",
                  horizon: String = "1 hour"): DataFrame =
    events.withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark(idCol)

  /** Run `body` with the session's streaming state store switched to
    * RocksDB, restoring the previous provider after. The default
    * (HDFSBackedStateStoreProvider) holds every state row ON-HEAP in
    * the executor — fine for bounded windows, a guaranteed OOM when
    * dedup/session state approaches the 100 TB-corpus keyspace.
    * RocksDB keeps state off-heap and spills to local disk, bounded
    * by disk instead of heap, and is the config any large-keyspace
    * deployment of [[dedupEvents]] / sessionization should run
    * (`spark.sql.streaming.stateStore.providerClass`; the provider
    * applies to queries STARTED inside the window — a running query
    * keeps the provider it started with, so scoping it per-launch is
    * sound).
    */
  def withRocksDbStateStore[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Run `body` with `spark.sql.shuffle.partitions` pinned to `n`,
    * restoring the previous value after. For a STATEFUL streaming
    * query the setting is more than shuffle width: the engine creates
    * one state-store instance PER shuffle partition, and every store
    * commits a delta file per micro-batch — so a query whose state is
    * small pays (partitions × batches) tiny-file commits of pure
    * fixed overhead. Measured on the five streaming gates at sf0.1
    * (`tools/StreamProbe`): 32 → 8 partitions cuts warm wall 30–45%
    * on every gate, 8 → 4 is marginal and regresses the RocksDB dedup
    * gate — so the gates run at 8. Aggregation VALUES are
    * partition-count-invariant (same oracles pass at any setting).
    * A production deployment sizes this to its keyspace instead —
    * state volume / store must fit executor memory (or RocksDB disk) —
    * and the checkpoint pins it at first start.
    *
    * The caller's `n` is a DEFAULT: setting
    * [[StreamPartitionsOverrideKey]] in the session conf overrides it,
    * so a measurement harness (`tools/StreamProbe`) can sweep the
    * setting through gate code that pins its own production value —
    * without the override, the gates' pin would silently nullify any
    * external sweep.
    */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val eff = spark.conf.getOption(StreamPartitionsOverrideKey) match {
      case None => n
      case Some(v) =>
        try v.trim.toInt
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$StreamPartitionsOverrideKey must be an int, got: '$v'")
        }
    }
    val prev = spark.conf.get(key)
    spark.conf.set(key, eff.toString)
    try body
    finally spark.conf.set(key, prev)
  }

  /** Session-conf key that overrides the `n` passed to
    * [[withShufflePartitions]] — see its scaladoc.
    */
  val StreamPartitionsOverrideKey = "spark.graft.stream.partitions"

  /** K5's streaming shape (SURVEY §2.9): drive a sink with
    * `foreachBatch` — each micro-batch goes through the caller's
    * writer (parquet history dir, JDBC table, …). This is the
    * cluster-scale replacement for the driver-side enqueue loop: the
    * reference's queue+background-thread batching IS micro-batching,
    * so the stream engine's epochs take over batch formation.
    *
    * Delivery contract: with a durable `checkpointDir`, a killed or
    * re-launched run resumes AFTER the last committed epoch instead of
    * re-reading the whole source. foreachBatch itself is at-least-once
    * on an epoch retry (the crash window between the write and the
    * commit), so a non-idempotent writer should stamp `epoch` into the
    * output (e.g. partition by it, or key the JDBC rows on it) to make
    * the replay overwrite rather than double-append. Without a
    * checkpointDir Spark allocates a throwaway location — fine for
    * one-shot backfills, wrong for anything incremental.
    */
  def streamTo(df: DataFrame, name: String,
               checkpointDir: Option[String] = None)
              (write: (DataFrame, Long) => Unit): Unit = {
    val base = df.writeStream
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
    val withCkpt = checkpointDir.fold(base)(base.option("checkpointLocation", _))
    val q = withCkpt
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       epoch: Long) =>
        write(batch.toDF(), epoch)
      }
      .start()
    q.awaitTermination()
  }
}
