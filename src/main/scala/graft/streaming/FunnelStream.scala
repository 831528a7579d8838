package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class FunnelEvent(user_id: Long, event_type: String, ts_micros: Long)

/** One row per user per STAGE ADVANCE — final by construction: each
  * stage timestamp is set at most once, so append mode never revises.
  */
case class FunnelAdvance(user_id: Long, stage: Long, ts_micros: Long)

/** First-view / first-qualifying-click / first-qualifying-purchase
  * timestamps — three optional longs, constant-size per key forever.
  */
case class FunnelState(v: Option[Long], c: Option[Long], p: Option[Long])

/** Streaming twin of [[graft.operators.Analytics.eventsFunnel]] —
  * the conversion funnel maintained LIVE (the 22nd maintained
  * streaming structure): the batch op's running RANGE minima (first
  * view, first click at-or-after a view, first purchase at-or-after
  * a qualifying click) ARE per-user state, three timestamps. A user
  * advances each stage at most once, so every emission is final
  * (append mode, no revision) and the running stage counts are
  * emission counts. Same-ts ties follow the batch RANGE rule
  * (order-blind within a timestamp) by serializing view < click <
  * purchase inside the sorted group iterator — the PatternStream
  * tie discipline; input contract: per-user event-time order across
  * micro-batches (day-sliced waves never split a timestamp).
  */
object FunnelStream {

  private val typeOrder = Map("view" -> 0, "click" -> 1, "purchase" -> 2)

  def update(userId: Long, rows: Iterator[FunnelEvent],
             state: GroupState[FunnelState]): Iterator[FunnelAdvance] = {
    var st = state.getOption.getOrElse(FunnelState(None, None, None))
    val out = scala.collection.mutable.ArrayBuffer[FunnelAdvance]()
    rows.toSeq
      .sortBy(e => (e.ts_micros, typeOrder.getOrElse(e.event_type, 3)))
      .foreach { e =>
        e.event_type match {
          case "view" if st.v.isEmpty =>
            st = st.copy(v = Some(e.ts_micros))
            out += FunnelAdvance(userId, 1L, e.ts_micros)
          case "click" if st.v.nonEmpty && st.c.isEmpty =>
            st = st.copy(c = Some(e.ts_micros))
            out += FunnelAdvance(userId, 2L, e.ts_micros)
          case "purchase" if st.c.nonEmpty && st.p.isEmpty =>
            st = st.copy(p = Some(e.ts_micros))
            out += FunnelAdvance(userId, 3L, e.ts_micros)
          case _ => ()
        }
      }
    state.update(st)
    out.iterator
  }

  /** Append-mode stage-advance feed over a funnel event stream. */
  def advance(s: SparkSession,
              events: Dataset[FunnelEvent]): Dataset[FunnelAdvance] = {
    import s.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
