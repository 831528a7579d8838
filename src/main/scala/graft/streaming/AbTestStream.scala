package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class AbEvent(event_type: String, user_id: Long, value: Double)

case class AbPoint(event_type: String, n_a: Long, n_b: Long,
                   mean_a: Double, mean_b: Double, z: Double)

/** Per-type running cohort moments — six BIGINTs, constant-size
  * however long the stream runs (the exact-aggregate rule makes the
  * statistic maintainable: integer micro sums merge associatively
  * across micro-batches, then the floats are derived per emission).
  */
case class AbState(nA: Long, sA: Long, qA: Long,
                   nB: Long, sB: Long, qB: Long)

/** Streaming twin of [[graft.operators.Analytics.eventsAbTest]]: a
  * LIVE experiment dashboard — after each micro-batch, the updated
  * Welch z per event type from the merged exact moments. Because the
  * state is the sufficient statistic (not the data), emissions after
  * the final batch are bit-equal to the batch query however events
  * were micro-batched; intermediate emissions are the correct
  * statistic over the prefix seen so far (update-mode semantics: the
  * row for a type is superseded by its next emission).
  */
object AbTestStream {

  def update(eventType: String, rows: Iterator[AbEvent],
             state: GroupState[AbState]): Iterator[AbPoint] = {
    var st = state.getOption.getOrElse(AbState(0L, 0L, 0L, 0L, 0L, 0L))
    rows.foreach { e =>
      val micro = math.round(e.value * 100)
      if (e.user_id % 2 == 0)
        st = st.copy(nA = st.nA + 1, sA = st.sA + micro,
          qA = Math.addExact(st.qA, Math.multiplyExact(micro, micro)))
      else
        st = st.copy(nB = st.nB + 1, sB = st.sB + micro,
          qB = Math.addExact(st.qB, Math.multiplyExact(micro, micro)))
    }
    state.update(st)
    if (st.nA > 1 && st.nB > 1) {
      // identical expression tree to the batch op: means in micro
      // units, sample variances from (n·Q − S²)/(n·(n−1)), Welch z
      val mA = st.sA.toDouble / st.nA
      val mB = st.sB.toDouble / st.nB
      val vA = (st.nA * st.qA - st.sA * st.sA).toDouble /
        (st.nA * (st.nA - 1)).toDouble
      val vB = (st.nB * st.qB - st.sB * st.sB).toDouble /
        (st.nB * (st.nB - 1)).toDouble
      val z = (mA - mB) / math.sqrt(vA / st.nA + vB / st.nB)
      Iterator.single(AbPoint(eventType, st.nA, st.nB,
        round4(mA / 100.0), round4(mB / 100.0), round4(z)))
    } else Iterator.empty
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Update-mode running report over the raw event stream. */
  def report(s: SparkSession, events: Dataset[AbEvent]): Dataset[AbPoint] = {
    import s.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
