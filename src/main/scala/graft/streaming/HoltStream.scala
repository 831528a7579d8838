package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class HoltPoint(event_type: String, day: String, level: Double,
                     trend: Double, forecast1: Double)

/** Trailing window of previous daily counts, most recent LAST —
  * bounded at 13 entries (14-day window minus the arriving day), the
  * EwmaState shape: constant-size per key forever.
  */
case class HoltState(recent: List[Long])

/** Streaming twin of
  * [[graft.operators.Analytics.eventsForecastHolt]] — level+trend
  * forecasting maintained LIVE (the 19th maintained streaming
  * structure): the TRUNCATED window is what makes this stream — each
  * closed day re-folds the last ≤14 counts, so state is the last 13
  * counts and every emission is final. The fold is the batch
  * operator's exact integer recursion (α=1/2, β=1/4 in micro-units;
  * Scala `Long./` truncates toward zero exactly like Spark `div` and
  * DuckDB `//`, negatives included), so points are bit-equal to the
  * oracled batch plan however days are micro-batched.
  */
object HoltStream {

  val WindowDays = 14

  /** The shared fold: init (l = w(0)·10⁶, b = 0), then per element
    * l' = (x·10⁶ + l + b + 1) / 2, b' = (l' − l + 3b + 2) / 4.
    */
  def fold(window: Seq[Long]): (Long, Long) = {
    var l = window.head * 1000000L
    var b = 0L
    window.tail.foreach { x =>
      val l2 = (x * 1000000L + l + b + 1L) / 2L
      b = (l2 - l + 3L * b + 2L) / 4L
      l = l2
    }
    (l, b)
  }

  /** 6dp, matching the batch surface (r12): the micro-unit quotient
    * has exactly six decimals, so 6dp rounding never lands on a .5
    * boundary — 4dp did, and Spark/DuckDB round .XXXX5 differently.
    */
  private def dp6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  def update(eventType: String, rows: Iterator[DailyCount],
             state: GroupState[HoltState]): Iterator[HoltPoint] = {
    var recent = state.getOption.map(_.recent).getOrElse(Nil)
    val out = rows.toSeq.sortBy(_.day).map { d =>
      val window = (recent :+ d.n).takeRight(WindowDays)
      val (l, b) = fold(window)
      recent = (recent :+ d.n).takeRight(WindowDays - 1)
      HoltPoint(eventType, d.day, dp6(l.toDouble / 1e6),
        dp6(b.toDouble / 1e6), dp6((l + b).toDouble / 1e6))
    }
    state.update(HoltState(recent))
    out.iterator
  }

  /** Append-mode forecaster over closed dense daily counts. */
  def forecast(s: SparkSession,
               daily: Dataset[DailyCount]): Dataset[HoltPoint] = {
    import s.implicits._
    daily.groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
