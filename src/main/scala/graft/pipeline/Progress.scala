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

/** Current-status surface — `set_status_log`/`get_current_status`
  * (`core/engine.py:60-80`): a live status string any observer can
  * poll, optionally appended (timestamped) to a status file a GUI or
  * `tail -f` watches. Driver-side by design: one line per pipeline
  * step, never per row.
  */
final class StatusLog(path: Option[java.nio.file.Path] = None) {

  @volatile private var current: Option[String] = None

  // Contract (reference parity, `core/engine.py:70-78`): a path that
  // IS a directory at write time gets the conventional status.log
  // inside it; anything else is treated as a file. Resolution happens
  // per write so a directory created after construction is honored —
  // but a path only created as a directory AFTER the first status
  // write will already hold a log file; point at the file explicitly
  // if the directory is made mid-run.
  private def target: Option[java.nio.file.Path] = path.map { p =>
    if (java.nio.file.Files.isDirectory(p)) p.resolve("status.log") else p
  }

  def set(status: String): Unit = {
    current = Some(status)
    target.foreach { p =>
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p,
        s"${java.time.Instant.now()} $status\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  }

  def currentStatus: Option[String] = current
}
