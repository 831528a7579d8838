package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class PatternEvent(user_id: Long, event_type: String,
                        ts: java.sql.Timestamp)

case class PatternHit(user_id: Long, match_ts: java.sql.Timestamp)

/** Per-user sequence-machine state: the latest view and the latest
  * QUALIFYING click — two timestamps, constant-size however long the
  * stream runs (the batch op's running RANGE maxima are exactly
  * these two values at each row).
  */
case class PatternState(lastView: Option[java.sql.Timestamp],
                        lastQualClick: Option[java.sql.Timestamp])

/** Streaming twin of [[graft.operators.Sequence.patternMatch]]: the
  * view → click → purchase detector is a 3-state machine per user —
  * the batch formulation's two running maxima (latest view, latest
  * qualifying click) ARE the state, so the stream carries two
  * timestamps per user and emits one [[PatternHit]] per completed
  * match, never revising (append discipline).
  *
  * Input contract: per-user event-time order across micro-batches,
  * and same-timestamp rows of a user arrive in the same micro-batch
  * (within a batch the group iterator is sorted here, with
  * view < click < purchase at equal timestamps — the stream's
  * serialization of the batch op's order-blind RANGE tie rule).
  * Interval comparisons run on Instants (micros preserved) so gap
  * decisions are bit-equal to the batch side's interval arithmetic.
  */
object PatternStream {

  private val prio = Map("view" -> 0, "click" -> 1, "purchase" -> 2)

  private def within(ts: java.sql.Timestamp,
                     base: Option[java.sql.Timestamp],
                     gapSeconds: Long): Boolean =
    base.exists(b => !ts.toInstant.isAfter(
      b.toInstant.plusSeconds(gapSeconds)))

  def update(gapSeconds: Long)(userId: Long, rows: Iterator[PatternEvent],
             state: GroupState[PatternState]): Iterator[PatternHit] = {
    var st = state.getOption.getOrElse(PatternState(None, None))
    val out = scala.collection.mutable.ArrayBuffer.empty[PatternHit]
    rows.toSeq
      .sortBy(e => (e.ts.toInstant.getEpochSecond,
        e.ts.toInstant.getNano, prio.getOrElse(e.event_type, 3)))
      .foreach { e =>
        e.event_type match {
          case "view" => st = st.copy(lastView = Some(e.ts))
          case "click" =>
            if (within(e.ts, st.lastView, gapSeconds))
              st = st.copy(lastQualClick = Some(e.ts))
          case "purchase" =>
            if (within(e.ts, st.lastQualClick, gapSeconds))
              out += PatternHit(userId, e.ts)
          case _ => ()
        }
      }
    state.update(st)
    out.iterator
  }

  /** Append-mode match feed over the raw event stream. */
  def matches(s: SparkSession, events: Dataset[PatternEvent],
              gapSeconds: Long = graft.operators.Sequence.GapSeconds)
      : Dataset[PatternHit] = {
    import s.implicits._
    events.filter(e =>
        e.event_type == "view" || e.event_type == "click" ||
          e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update(gapSeconds))
  }
}
