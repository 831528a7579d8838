package graft.streaming

import graft.functions.HashUtils
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class SrmEvent(event_type: String, user_id: Long)

case class SrmPoint(event_type: String, n_a: Long, n_b: Long,
                    chi2: Double, srm: Boolean)

/** Per-type state: one KMV k-min set of 60-bit user hashes PER ARM —
  * BOUNDED at 2·K longs per event type forever, however many users
  * arrive (the r11 exact form kept every distinct user and grew
  * without bound). KMV gives the graceful degradation an exact
  * seen-set cannot: below K distinct users per arm the set holds
  * every hash and the count is EXACT (so the streaming/batch
  * equivalence with the oracled `events_ab_srm` is bit-for-bit at
  * any cardinality under K); at or above K it is the standard
  * (K−1)/U_(K) estimate and the chi-square becomes a screen rather
  * than a test — the documented approximate mode. Redelivery stays
  * idempotent BY CONSTRUCTION at both regimes: a re-sent user's hash
  * re-enters a set it is already in (or re-evicts past the k-th min),
  * a no-op either way. Event volume never grows the state — a user's
  * 10⁶th event is one TreeSet probe.
  */
case class SrmState(minsA: Seq[Long], minsB: Seq[Long])

/** Streaming twin of [[graft.operators.Analytics.eventsAbSrm]]: the
  * LIVE sample-ratio-mismatch guardrail — after each micro-batch, the
  * updated two-cell chi-square per event type over distinct users per
  * arm. First-seen dedup lives INSIDE the state (Spark disallows a
  * dropDuplicates stage feeding flatMapGroupsWithState — no chained
  * stateful operators around FMGWS) as the KMV sketch the batch
  * sketch family already ships ([[graft.operators.Sketch]]), hashed
  * with the same Md5Prefix60 kernel so the whole statistic stays a
  * pure function of the data. Emissions after the final batch equal
  * the batch query however events were micro-batched (k-min sets are
  * order-free).
  */
object SrmStream {

  /** Per-arm sketch size: 4096 longs ≈ 32 KB an arm, ~1.6% standard
    * error in estimate mode — and exact far past any test corpus.
    */
  val K = 4096

  private val TwoPow60 = 1152921504606846976L.toDouble

  /** Exact cardinality below K (the set retained everything);
    * Bar-Yossef (K−1)/U_(K) above, on the same 60-bit hash scale as
    * [[graft.operators.Sketch]].
    */
  private def estimate(set: java.util.TreeSet[java.lang.Long]): Long =
    if (set.size < K) set.size.toLong
    else math.round((K - 1).toDouble * TwoPow60 / set.last().toDouble)

  private def toSet(mins: Seq[Long]): java.util.TreeSet[java.lang.Long] = {
    val s = new java.util.TreeSet[java.lang.Long]()
    mins.foreach(h => s.add(h))
    s
  }

  private def toSeq(s: java.util.TreeSet[java.lang.Long]): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    s.iterator().asScala.map(_.longValue()).toVector
  }

  def update(eventType: String, rows: Iterator[SrmEvent],
             state: GroupState[SrmState]): Iterator[SrmPoint] = {
    val st = state.getOption.getOrElse(SrmState(Nil, Nil))
    val a = toSet(st.minsA)
    val b = toSet(st.minsB)
    rows.foreach { e =>
      val t = if (e.user_id % 2 == 0) a else b
      t.add(HashUtils.md5Prefix60(
        String.valueOf(e.user_id).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      if (t.size > K) t.pollLast()
    }
    state.update(SrmState(toSeq(a), toSeq(b)))
    val nA = estimate(a)
    val nB = estimate(b)
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
