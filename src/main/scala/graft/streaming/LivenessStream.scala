package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class LiveEvent(event_type: String, ts: java.sql.Timestamp)

case class LiveState(lastSeenDay: Long, maxGapDays: Long)

case class LiveAlert(event_type: String, last_seen_day: Long,
                     max_gap_days: Long, fired: Boolean)

/** Streaming LIVENESS monitor — the twin of the batch
  * `events_absence_alert`, and the repo's first TIMEOUT-DRIVEN
  * stream: every other streaming structure here reacts to DATA, but
  * silence produces no data to react to, so this one arms an
  * EVENT-TIME TIMEOUT at (last_seen + own-worst-historical-gap + 1)
  * days and lets the WATERMARK fire it — the self-calibrating
  * threshold of the batch twin, enforced by the engine's timer
  * machinery rather than a dense calendar scan. Event-time (not
  * processing-time) timeouts keep the monitor deterministic and
  * replayable: the alert depends only on the data's own timestamps,
  * so a replayed log fires the identical alert. State is two longs
  * per type; a fired alert removes the state (alert once — a revival
  * restarts the history fresh, the paging convention).
  */
object LivenessStream {

  private val DayMs = 86400000L

  def update(eventType: String, rows: Iterator[LiveEvent],
             state: GroupState[LiveState]): Iterator[LiveAlert] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      Iterator.single(LiveAlert(eventType, st.lastSeenDay,
        st.maxGapDays, fired = true))
    } else {
      val days = rows.map(e => e.ts.getTime / DayMs).toArray.sorted
      var st = state.getOption.getOrElse(LiveState(days.head, 0L))
      days.foreach { d =>
        if (d > st.lastSeenDay)
          st = LiveState(d, math.max(st.maxGapDays, d - st.lastSeenDay))
      }
      state.update(st)
      // arm past the current watermark (Spark rejects a stale timer);
      // semantics unchanged — it fires at the next watermark advance
      val arm = math.max((st.lastSeenDay + st.maxGapDays + 1) * DayMs,
        state.getCurrentWatermarkMs + 1)
      state.setTimeoutTimestamp(arm)
      Iterator.single(LiveAlert(eventType, st.lastSeenDay,
        st.maxGapDays, fired = false))
    }
  }

  /** Update-mode liveness feed: heartbeat rows while data flows, one
    * fired=true alert when a type's silence outlives its history.
    */
  def monitor(s: SparkSession,
              events: Dataset[LiveEvent]): Dataset[LiveAlert] = {
    import s.implicits._
    events.withWatermark("ts", "0 seconds")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
