package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class MicroValue(event_type: String, micro: Long)

case class MomentsPoint(event_type: String, n: Long, mean_val: Double,
                        skewness: Double, kurtosis: Double)

/** Exact power sums Σx..Σx⁴ in micro-units — the sufficient statistic
  * for mean/variance/skew/kurtosis, mergeable and ORDER-FREE (integer
  * addition commutes), so any micro-batching yields the same state.
  * x⁴ terms overflow BIGINT at five rows; BigDecimal(38,0) is the
  * state type, the batch plan's DECIMAL(38,0) discipline verbatim.
  */
case class MomentsState(n: Long, s1: Long, s2: BigDecimal,
                        s3: BigDecimal, s4: BigDecimal)

/** Streaming twin of [[graft.operators.Analytics.eventsMoments]] —
  * the tail-shape dashboard maintained LIVE (the 20th maintained
  * streaming structure): per event type, five exact integers of
  * state absorb each arriving value; each micro-batch re-emits the
  * key's current (n, mean, skew, kurt) — a running dashboard row
  * (the A/B-dashboard emission contract: latest row per key is the
  * answer), and once the stream drains, the final row is BIT-EQUAL
  * to the oracled batch query because the double tail below is the
  * batch plan's scalar arithmetic op-for-op.
  */
object MomentsStream {

  def update(eventType: String, rows: Iterator[MicroValue],
             state: GroupState[MomentsState]): Iterator[MomentsPoint] = {
    var st = state.getOption.getOrElse(
      MomentsState(0L, 0L, BigDecimal(0), BigDecimal(0), BigDecimal(0)))
    rows.foreach { r =>
      val m = BigDecimal(r.micro)
      st = MomentsState(st.n + 1, st.s1 + r.micro, st.s2 + m * m,
        st.s3 + m * m * m, st.s4 + m * m * m * m)
    }
    state.update(st)
    if (st.n <= 1) Iterator.empty
    else {
      // the batch tail verbatim: every operand an exact integer cast
      // to double, ops in the identical order, m2^1.5 as m2·√m2
      val nd = st.n.toDouble
      val mean = st.s1.toDouble / nd
      val e2 = st.s2.toDouble / nd
      val e3 = st.s3.toDouble / nd
      val e4 = st.s4.toDouble / nd
      val m2 = e2 - mean * mean
      val m3 = e3 - 3.0 * mean * e2 + 2.0 * mean * mean * mean
      val m4 = e4 - 4.0 * mean * e3 + 6.0 * mean * mean * e2 -
        3.0 * mean * mean * mean * mean
      def dp4(v: Double): Double =
        BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      Iterator.single(MomentsPoint(eventType, st.n, dp4(mean / 100.0),
        dp4(m3 / (m2 * math.sqrt(m2))), dp4(m4 / (m2 * m2) - 3.0)))
    }
  }

  /** Running moments dashboard over a stream of micro-unit values.
    * Update mode, NOT Append: each micro-batch re-emits a REVISED row
    * per key (the running-dashboard contract SrmStream uses), so an
    * append-mode consumer would accumulate stale revisions — the
    * sink must upsert on key, which is what Update declares.
    */
  def track(s: SparkSession,
            values: Dataset[MicroValue]): Dataset[MomentsPoint] = {
    import s.implicits._
    values.groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
