package graft.pipeline

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Listener-based progress — the Spark face of the reference's GUI
  * progress callbacks and step events (`core/engine.py:34-60, 485-555`,
  * `widgets/batch_thread.py:20-62`). The reference pre-walks the tree
  * to count steps; Spark already knows its task counts, so progress is
  * a `SparkListener` fed by the scheduler — no double traversal.
  */
final class Progress(spark: SparkSession) extends SparkListener {

  private val jobsStarted = new AtomicInteger(0)
  private val jobsEnded = new AtomicInteger(0)
  private val stagesCompleted = new AtomicInteger(0)
  private val tasksCompleted = new AtomicLong(0L)

  spark.sparkContext.addSparkListener(this)

  override def onJobStart(e: SparkListenerJobStart): Unit =
    jobsStarted.incrementAndGet()

  override def onJobEnd(e: SparkListenerJobEnd): Unit =
    jobsEnded.incrementAndGet()

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    stagesCompleted.incrementAndGet()
    tasksCompleted.addAndGet(e.stageInfo.numTasks.toLong)
  }

  def snapshot: Progress.Snapshot = Progress.Snapshot(
    jobsStarted.get(), jobsEnded.get(), stagesCompleted.get(),
    tasksCompleted.get())

  def detach(): Unit = spark.sparkContext.removeSparkListener(this)
}

object Progress {
  final case class Snapshot(jobsStarted: Int, jobsEnded: Int,
                            stagesCompleted: Int, tasksCompleted: Long)
}
