package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One CLOSED day of one event type — the unit the upstream
  * watermarked daily aggregation emits in append mode as its windows
  * finalize (the stream_window_daily shape).
  */
case class DailyCount(event_type: String, day: String, n: Long)

/** Running prefix statistics per event type: exact integer Σ1, Σn,
  * Σn². Longs with add/multiplyExact guards — Σn² wraps past daily
  * counts of ~3e9, and a silent wrap would flip variance negative and
  * mute every later anomaly, so the stream raises at the documented
  * bound instead (the simhash LaneCap discipline); shard the key
  * upstream if a single event type legitimately exceeds it. The batch
  * twin covers the full range via DECIMAL(38,0).
  */
case class AnomalyState(nd: Long, s1: Long, s2: Long)

case class AnomalyFlag(event_type: String, day: String, n: Long,
                       zscore: Double)

/** Streaming twin of [[graft.operators.Analytics.eventsAnomalyOnline]]:
  * the online semantics (each day scored against its PREDECESSORS
  * only) is chosen so that a stateful stream can emit scores that
  * never revise — `flatMapGroupsWithState` keyed by event_type holds
  * (N, Σn, Σn²) over closed days and scores each arriving day BEFORE
  * folding it in, which is exactly the batch query's
  * ROWS … 1 PRECEDING window. Input contract: days arrive in
  * event-time order per key across micro-batches (the upstream
  * watermarked window aggregate closes them in order); within a
  * micro-batch the group iterator is sorted here, since Spark does
  * not order it.
  */
object AnomalyStream {

  val WarmupDays = 7
  val Threshold = 2.0

  /** Score one day against the prior-stats state; None while warming
    * up, when the prior days carry no variance (decided in exact
    * BigInt arithmetic: nd·Σn² > (Σn)² — the batch twin's decimal
    * predicate), or below the flag threshold. The double expression
    * tree mirrors the batch column expression op-for-op, and rounding
    * is HALF_UP at 4dp like Spark's `round`.
    */
  def score(st: AnomalyState, n: Long): Option[Double] = {
    if (st.nd < WarmupDays) None
    else if (BigInt(st.nd) * BigInt(st.s2) <= BigInt(st.s1) * BigInt(st.s1))
      None
    else {
      val mean = st.s1.toDouble / st.nd
      val z = (n - mean) /
        math.sqrt(st.s2.toDouble / st.nd - mean * mean)
      val r = BigDecimal(z)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (math.abs(r) >= Threshold) Some(r) else None
    }
  }

  def update(eventType: String, rows: Iterator[DailyCount],
             state: GroupState[AnomalyState]): Iterator[AnomalyFlag] = {
    var st = state.getOption.getOrElse(AnomalyState(0L, 0L, 0L))
    val flags = rows.toSeq.sortBy(_.day).flatMap { d =>
      val f = score(st, d.n).map(z => AnomalyFlag(eventType, d.day, d.n, z))
      st = AnomalyState(st.nd + 1, Math.addExact(st.s1, d.n),
        Math.addExact(st.s2, Math.multiplyExact(d.n, d.n)))
      f
    }
    state.update(st)
    flags.iterator
  }

  /** Append-mode detector over a stream of closed daily counts. */
  def detect(s: SparkSession,
             daily: Dataset[DailyCount]): Dataset[AnomalyFlag] = {
    import s.implicits._
    daily.groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
