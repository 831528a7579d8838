package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class SrmEvent(event_type: String, user_id: Long)

case class SrmPoint(event_type: String, n_a: Long, n_b: Long,
                    chi2: Double, srm: Boolean)

/** Per-type state: the users already counted plus the running arm
  * counts. The seen-set is USER-cardinality-bounded — the irreducible
  * lower bound for an EXACT distinct-user statistic (the
  * randomization unit must be deduplicated somewhere); a production
  * deployment shards it by user-hash like any exactly-once per-user
  * metric, or swaps in the KMV sketch where approximate counts
  * suffice (at which point the chi-square becomes a screen, not a
  * test). Event volume does NOT grow the state — a user's 10⁶th
  * event is one map lookup.
  */
case class SrmState(seen: Map[Long, Boolean], nA: Long, nB: Long)

/** Streaming twin of [[graft.operators.Analytics.eventsAbSrm]]: the
  * LIVE sample-ratio-mismatch guardrail — after each micro-batch, the
  * updated two-cell chi-square per event type over distinct users per
  * arm. First-seen dedup lives INSIDE the state (Spark disallows a
  * dropDuplicates stage feeding flatMapGroupsWithState — no chained
  * stateful operators around FMGWS), which also makes redelivery
  * idempotent by construction: a re-sent user is a no-op. Emissions
  * after the final batch are equal to the batch query however events
  * were micro-batched (counts are set-cardinalities, order-free).
  */
object SrmStream {

  def update(eventType: String, rows: Iterator[SrmEvent],
             state: GroupState[SrmState]): Iterator[SrmPoint] = {
    val st = state.getOption.getOrElse(SrmState(Map.empty, 0L, 0L))
    var seen = st.seen
    var nA = st.nA
    var nB = st.nB
    rows.foreach { e =>
      if (!seen.contains(e.user_id)) {
        seen = seen + (e.user_id -> true)
        if (e.user_id % 2 == 0) nA += 1 else nB += 1
      }
    }
    state.update(SrmState(seen, nA, nB))
    if (nA + nB > 0) {
      // identical expression tree to the batch op: integer squared
      // difference, one double division; the flag compares UNROUNDED
      val chi2 = Math.multiplyExact(nA - nB, nA - nB).toDouble / (nA + nB)
      Iterator.single(SrmPoint(eventType, nA, nB, round4(chi2),
        chi2 > 3.841))
    } else Iterator.empty
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Update-mode running guardrail over the raw event stream. */
  def report(s: SparkSession, events: Dataset[SrmEvent]): Dataset[SrmPoint] = {
    import s.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
