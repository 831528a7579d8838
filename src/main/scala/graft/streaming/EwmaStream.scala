package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class EwmaPoint(event_type: String, day: String, ewma: Double)

/** Trailing window of previous daily counts, most recent LAST —
  * bounded at 13 entries (the 14-day window minus the arriving day),
  * so state is constant-size per key however long the stream runs.
  */
case class EwmaState(recent: List[Long])

/** Streaming twin of [[graft.operators.Analytics.eventsEwma]]: the
  * truncated EWMA is DESIGNED to stream — a 14-day truncation means
  * per-key state is the last 13 closed daily counts, and each
  * arriving closed day emits its smoothed value immediately and
  * never revises (the online-anomaly discipline). Input contract:
  * the DENSE daily series per type (zero-filled — the gap-fill
  * operator's output shape), days arriving in event-time order per
  * key across micro-batches; within a micro-batch the group iterator
  * is sorted here.
  *
  * Arithmetic mirrors the batch op exactly: power-of-two weights ×
  * integer counts folded with overflow guards into exact BIGINT
  * num/den, one double division, HALF_UP 4dp — bit-equal to the
  * banded-self-join batch plan however the days are micro-batched.
  */
object EwmaStream {

  val WindowDays = 14

  def update(eventType: String, rows: Iterator[DailyCount],
             state: GroupState[EwmaState]): Iterator[EwmaPoint] = {
    var recent = state.getOption.map(_.recent).getOrElse(Nil)
    val out = rows.toSeq.sortBy(_.day).map { d =>
      val window = (recent :+ d.n).takeRight(WindowDays)
      var num = 0L
      var den = 0L
      window.zipWithIndex.foreach { case (n, i) =>
        val lag = window.length - 1 - i
        val w = 1L << (13 - lag)
        num = Math.addExact(num, Math.multiplyExact(n, w))
        den += w
      }
      val e = BigDecimal(num.toDouble / den)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      recent = (recent :+ d.n).takeRight(WindowDays - 1)
      EwmaPoint(eventType, d.day, e)
    }
    state.update(EwmaState(recent))
    out.iterator
  }

  /** Append-mode smoother over a stream of closed DENSE daily counts. */
  def smooth(s: SparkSession,
             daily: Dataset[DailyCount]): Dataset[EwmaPoint] = {
    import s.implicits._
    daily.groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
