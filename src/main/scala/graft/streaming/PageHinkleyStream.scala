package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class PhPoint(event_type: String, day: String, ph_micro: Long,
                   alarm: Boolean)

/** Page–Hinkley running state — four longs, constant-size per key
  * forever: day index t, count cum-sum, deviation cum-sum U, and its
  * prefix minimum.
  */
case class PhState(t: Long, cum: Long, u: Long, minU: Long)

/** Streaming twin of [[graft.operators.Analytics.eventsPageHinkley]]
  * — the drift detector maintained LIVE (the 18th maintained
  * streaming structure): Page–Hinkley is a one-pass recurrence by
  * construction, so the stream form is the algorithm as published;
  * the batch windows exist to REPLAY it columnar. State is four
  * BIGINTs per key; every arithmetic step is the batch plan's exact
  * integer op (micro-unit HALF-UP running mean via
  * (2·cum·10⁶ + t) div (2·t)), so per-day PH values are bit-equal
  * to the batch series however the days are micro-batched. Input
  * contract: the DENSE per-type daily series in event-time order
  * per key (the EwmaStream contract); same-batch rows are sorted on
  * the group iterator.
  */
object PageHinkleyStream {

  val DeltaMicro = 2L * 1000000L
  val LambdaMicro = 50L * 1000000L

  def update(eventType: String, rows: Iterator[DailyCount],
             state: GroupState[PhState]): Iterator[PhPoint] = {
    var st = state.getOption.getOrElse(PhState(0L, 0L, 0L, Long.MaxValue))
    val out = rows.toSeq.sortBy(_.day).map { dRow =>
      val t = st.t + 1
      val cum = Math.addExact(st.cum, dRow.n)
      // positive operands: Long / is truncation = floor = Spark div.
      // multiplyExact throughout — the batch twin documents
      // DECIMAL(38,0) as the headroom move; this twin must THROW at
      // the same ceiling (cum ≈ 4.6e12), never wrap silently
      val mq = Math.addExact(
        Math.multiplyExact(Math.multiplyExact(2L, cum), 1000000L), t) /
        (2L * t)
      val dev = Math.multiplyExact(dRow.n, 1000000L) - mq - DeltaMicro
      val u = Math.addExact(st.u, dev)
      val minU = math.min(if (st.t == 0L) u else st.minU, u)
      st = PhState(t, cum, u, minU)
      PhPoint(eventType, dRow.day, u - minU, u - minU > LambdaMicro)
    }
    state.update(st)
    out.iterator
  }

  /** Append-mode drift detector over closed dense daily counts. */
  def detect(s: SparkSession,
             daily: Dataset[DailyCount]): Dataset[PhPoint] = {
    import s.implicits._
    daily.groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
