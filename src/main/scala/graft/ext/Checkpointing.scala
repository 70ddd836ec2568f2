package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Lineage-truncation mode for the iterative operators
  * ([[DupClusters.components]]/[[DupClusters.componentsStar]],
  * [[Similarity.kmeansTrain]]). Each round's plan embeds the prior
  * round's, so without truncation the logical plan doubles per round
  * and the analyzer OOMs on deep iterations; the mode picks WHERE the
  * truncated state lives.
  */
sealed trait CheckpointMode
object CheckpointMode {
  /** Executor-local checkpoint blocks (`Dataset.localCheckpoint`) —
    * the default: fastest, but NON-fault-tolerant (an executor loss
    * loses blocks computed from already-truncated lineage and fails
    * the job). The right mode for single-JVM/bench runs and for
    * clusters where re-running the whole operator on rare executor
    * loss is acceptable.
    */
  case object Local extends CheckpointMode

  /** Reliable checkpoint files under `dir` (`Dataset.checkpoint` via
    * `sparkContext.setCheckpointDir`) — survives executor loss, the
    * production mode for long iterative runs on real clusters. `dir`
    * should be on durable shared storage (HDFS/object store). Costs a
    * durable write per round; the implementation persists the round
    * before checkpointing so the checkpoint-write job reads the cache
    * instead of recomputing the round.
    *
    * END-OF-LIFE: the CALLER owns cleanup of `dir`. Superseded rounds
    * are deleted as iteration proceeds, but the FINAL round's
    * checkpoint files back the returned frame — they must outlive the
    * call (deleting them would break the result's lineage), so the
    * operators cannot free them. Consume the result (write it out /
    * collect what you need), then delete `dir`; a long-lived session
    * that calls iterative operators repeatedly without doing so
    * accumulates one final-round directory per call.
    */
  final case class Reliable(dir: String) extends CheckpointMode
}

/** Per-round checkpoint-and-free plumbing shared by the iterative
  * operators: checkpoint a round, get back a [[Checkpointing.Handle]]
  * to its backing state, and [[Checkpointing.free]] it once the round
  * is superseded — so a long run holds at most two rounds of state
  * (local blocks OR reliable files), never all of them.
  *
  * State tracking is delta-based (getPersistentRDDs for local blocks,
  * a checkpoint-root listing for reliable files) because the Dataset
  * API exposes no handle to the backing RDD; the delta assumes no
  * CONCURRENT checkpointing in the same session from other threads —
  * the same single-operator-at-a-time caveat the previous inline
  * tracking had.
  */
private[graft] object Checkpointing {

  /** Opaque handle to one checkpointed round's backing state: local
    * block RDD ids and/or reliable checkpoint directories.
    */
  final case class Handle(rddIds: Set[Int], paths: Seq[String])

  /** Eagerly checkpoint `df` under `mode`; returns the truncated frame
    * and the handle to the state backing it.
    */
  def checkpoint(df: DataFrame,
                 mode: CheckpointMode): (DataFrame, Handle) = mode match {
    case CheckpointMode.Local =>
      val sc = df.sparkSession.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val cp = df.localCheckpoint(true)
      (cp, Handle((sc.getPersistentRDDs.keySet -- before).toSet, Nil))
    case CheckpointMode.Reliable(dir) =>
      val sc = df.sparkSession.sparkContext
      ensureCheckpointDir(sc, dir)
      val root = new Path(sc.getCheckpointDir.get)
      val fs = root.getFileSystem(sc.hadoopConfiguration)
      def rddDirs: Set[String] =
        if (!fs.exists(root)) Set.empty
        else fs.listStatus(root).map(_.getPath.toString).toSet
      val before = rddDirs
      // persist first: Dataset.checkpoint(eager) runs a count job and
      // THEN a checkpoint-write job — unpersisted, the round would be
      // computed twice per iteration. The cache is released as soon as
      // the files are written; the returned frame reads the files.
      val persisted = df.persist(StorageLevel.MEMORY_AND_DISK)
      val cp =
        try persisted.checkpoint(true)
        finally persisted.unpersist(blocking = false)
      (cp, Handle(Set.empty, (rddDirs -- before).toSeq))
  }

  /** Release a superseded round's state: unpersist its local blocks,
    * delete its reliable checkpoint directories.
    */
  def free(spark: SparkSession, h: Handle): Unit = {
    val sc = spark.sparkContext
    h.rddIds.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    h.paths.foreach { p =>
      val path = new Path(p)
      path.getFileSystem(sc.hadoopConfiguration).delete(path, true)
    }
  }

  /** Point the context's checkpoint dir under `dir` if it isn't
    * already — `setCheckpointDir` mints a fresh UUID subdir per call,
    * so calling it unconditionally would scatter one operator's rounds
    * across directories and break the listing delta.
    */
  private def ensureCheckpointDir(sc: org.apache.spark.SparkContext,
                                  dir: String): Unit = {
    val want = {
      val p = new Path(dir)
      p.getFileSystem(sc.hadoopConfiguration).makeQualified(p)
    }
    val alreadyUnder = sc.getCheckpointDir.exists { cur =>
      Option(new Path(cur).getParent).contains(want)
    }
    if (!alreadyUnder) sc.setCheckpointDir(dir)
  }
}
