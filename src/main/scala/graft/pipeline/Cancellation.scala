package graft.pipeline

import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.SparkSession

/** Cooperative run cancellation — the reference's `_is_cancelled`
  * checks between steps (`core/engine.py:82-85,127,360-361,477-478`)
  * mapped to Spark's two cancellation levers:
  *
  *  - a driver-side flag the [[Runner]] consults BETWEEN rules (the
  *    reference's between-step early return — no new work is planned
  *    once cancelled);
  *  - a Spark job group (`setJobGroup(..., interruptOnCancel = true)` /
  *    `cancelJobGroup`) so IN-FLIGHT distributed jobs — the part a
  *    single-node engine doesn't have — are killed too, with task
  *    threads interrupted. On a 1000-executor cluster this is the only
  *    way a misbehaving stage releases its slots before completing.
  *
  * One token per run; safe to cancel from any thread (a GUI/CLI
  * listener, a timeout watchdog).
  */
final class CancelToken(spark: SparkSession, val runId: String) {

  private val flag = new AtomicBoolean(false)

  /** Request cancellation: between-step checks stop scheduling new
    * rules, and every Spark job tagged with this run's group is killed
    * (task threads interrupted).
    */
  def cancel(): Unit = {
    flag.set(true)
    spark.sparkContext.cancelJobGroup(runId)
  }

  def isCancelled: Boolean = flag.get

  /** Run `body`'s Spark actions under this run's job group so that a
    * later [[cancel]] reaches them. Restores the previous group after.
    */
  def withJobGroup[T](desc: String)(body: => T): T = {
    spark.sparkContext.setJobGroup(runId, desc, interruptOnCancel = true)
    try body
    finally spark.sparkContext.clearJobGroup()
  }
}

object CancelToken {
  private val counter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Fresh token with a unique job-group id. */
  def apply(spark: SparkSession): CancelToken =
    new CancelToken(spark, s"graft-run-${counter.incrementAndGet()}")
}
