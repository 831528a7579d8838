package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class UserEvent(user_id: Long, event_id: Long, sec: Long)

/** Five longs per user — the exact integer moments the batch op's
  * variance evaluates from, plus the (sec, event_id) cursor that
  * links the last event of one micro-batch to the first of the
  * next. Constant-size state however long the stream runs.
  */
case class BotState(lastSec: Long, lastEid: Long,
                    n: Long, sg: Long, sg2: Long)

case class BotScoreRow(user_id: Long, n_gaps: Long, mean_gap_s: Double,
                       cv_gap: Double, is_regular: Boolean)

/** Streaming twin of [[graft.operators.Sequence.botScore]] — the
  * 10th maintained streaming structure: gap moments (n, Σg, Σg²)
  * are MERGEABLE integers, so per-user state is five longs and each
  * micro-batch folds its events in (sec, event_id) order, bridging
  * the batch boundary through the stored cursor. After every batch
  * the user's CURRENT score emits (update-mode semantics); once the
  * same events have flowed, the latest emission per user equals the
  * batch operator bit-for-bit under any EVENT-TIME-ORDERED
  * micro-batching (BotScoreStreamSpec pins prefix splits). An event
  * arriving BEHIND the stored cursor — (sec, event_id) below the last
  * folded event — cannot be folded without rewriting history (the
  * moments are order-blind but the gap decomposition is not), so it
  * is DROPPED rather than silently folded as a negative gap; a
  * deployment needing late data buffers by watermark upstream.
  */
object BotScoreStream {

  val CvFlag = 0.5

  private def score(st: BotState): Option[BotScoreRow] =
    if (st.n < 2) None
    else {
      val mean = st.sg.toDouble / st.n
      val variance = (st.sg2.toDouble * st.n - st.sg.toDouble * st.sg) /
        (st.n.toDouble * (st.n - 1))
      val cv = if (st.sg > 0) math.sqrt(variance) / mean else 0.0
      val cv4 = BigDecimal(cv)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val mean2 = BigDecimal(mean)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      Some(BotScoreRow(0L, st.n, mean2, cv4, cv4 < CvFlag))
    }

  def update(userId: Long, rows: Iterator[UserEvent],
             state: GroupState[BotState]): Iterator[BotScoreRow] = {
    var st = state.getOption.getOrElse(BotState(Long.MinValue, 0L, 0L, 0L, 0L))
    rows.toSeq.sortBy(e => (e.sec, e.event_id))
      // late-arrival guard: an event behind the cursor would fold a
      // negative gap into the moments and diverge forever — drop it
      .filter(e => st.lastSec == Long.MinValue ||
        e.sec > st.lastSec ||
        (e.sec == st.lastSec && e.event_id > st.lastEid))
      .foreach { e =>
      if (st.lastSec != Long.MinValue) {
        val gap = e.sec - st.lastSec
        st = st.copy(n = st.n + 1,
          sg = Math.addExact(st.sg, gap),
          sg2 = Math.addExact(st.sg2, Math.multiplyExact(gap, gap)))
      }
      st = st.copy(lastSec = e.sec, lastEid = e.event_id)
    }
    state.update(st)
    score(st).map(_.copy(user_id = userId)).iterator
  }

  /** Update-mode scorer over a stream of (user_id, event_id, sec). */
  def attach(s: SparkSession,
             events: Dataset[UserEvent]): Dataset[BotScoreRow] = {
    import s.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
