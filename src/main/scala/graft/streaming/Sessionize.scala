package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed sessionization over `KeyValueGroupedDataset` — batch
  * (`flatMapGroups`) and streaming-state (`flatMapGroupsWithState`)
  * variants of the gap-based session builder (the window-function
  * version is q23; these are the custom-state API the same pipeline
  * uses when sessions must close incrementally on a live stream).
  */
object Sessionize {

  final case class Event(user_id: Long, event_id: Long, ts_secs: Long)
  final case class Session(user_id: Long, session_idx: Long, n_events: Long,
                           first_event: Long, last_event: Long)
  final case class SessionState(sessionIdx: Long, nEvents: Long,
                                firstEvent: Long, lastEvent: Long,
                                lastTs: Long)

  /** Batch: group by user, order events by id in the group, split at
    * gaps > `gapSecs`. One shuffle on user_id; per-group work is linear
    * and bounded by a user's event count.
    */
  def sessionsBatch(events: DataFrame, gapSecs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("long").as("ts_secs"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(_.event_id)
        val out = scala.collection.mutable.ListBuffer.empty[Session]
        var idx = 0L; var n = 0L; var first = 0L; var last = 0L
        var prevTs = Long.MinValue
        for (e <- evs) {
          if (prevTs == Long.MinValue || e.ts_secs - prevTs > gapSecs) {
            if (n > 0) out += Session(uid, idx, n, first, last)
            idx += 1; n = 0; first = e.event_id
          }
          n += 1; last = e.event_id; prevTs = e.ts_secs
        }
        if (n > 0) out += Session(uid, idx, n, first, last)
        out.iterator
      }
  }

  /** Streaming: per-user state carries the open session; an event past
    * the gap emits the closed session and re-seeds. The final open
    * session stays in state (it would close via timeout on a live
    * stream) — callers see completed sessions only.
    */
  def sessionsStreaming(events: Dataset[Event],
                        gapSecs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val evs = it.toArray.sortBy(_.event_id)
          val out = scala.collection.mutable.ListBuffer.empty[Session]
          var st = state.getOption.getOrElse(SessionState(0L, 0L, 0L, 0L, Long.MinValue))
          for (e <- evs) {
            if (st.lastTs == Long.MinValue || e.ts_secs - st.lastTs > gapSecs) {
              if (st.nEvents > 0)
                out += Session(uid, st.sessionIdx, st.nEvents, st.firstEvent, st.lastEvent)
              st = SessionState(st.sessionIdx + 1, 0L, e.event_id, e.event_id, e.ts_secs)
            }
            st = st.copy(nEvents = st.nEvents + 1, lastEvent = e.event_id,
              lastTs = e.ts_secs)
          }
          state.update(st)
          out.iterator
      }
  }
}
