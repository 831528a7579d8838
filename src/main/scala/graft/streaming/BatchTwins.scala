package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch twins of the streaming components, as oracle-checkable
  * queries. The streaming pipelines themselves are spec-verified
  * (StreamingWalSpec / WatermarkSpec / FileStreamWalSpec prove
  * stream ≡ batch on the same input); these queries put the exact
  * aggregation each stream maintains under the DuckDB oracle gate
  * too, so every SURVEY §2 row has a CORRECTNESS entry.
  */
object BatchTwins {

  /** The six-field [[WalState]] that [[WalStream.recover]]'s
    * mapGroupsWithState maintains per key, computed as one
    * partial-aggregating groupBy over the whole log (newest row by
    * (ts, event_id), same tiebreak as `updateState`). `last_ts` is
    * epoch millis, as in the streaming state.
    */
  def walStateQuery(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("sum_value"),
        round(max_by(col("value"), struct(col("ts"), col("event_id"))), 4)
          .as("last_value"),
        expr("unix_micros(max(ts)) div 1000").as("last_ts"),
        max_by(col("event_id"), struct(col("ts"), col("event_id")))
          .as("last_event_id"))
      .orderBy("user_id")

  /** The append-mode watermarked aggregation of WatermarkSpec —
    * `window(ts, '1 day')` counts and sums — run as a batch query.
    * The spec proves each emitted window equals this result; the
    * oracle pins the values themselves.
    */
  def windowDailyQuery(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sv"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("n"), col("sv"))
      .orderBy("day")

  /** Purchase←click attribution as an INTERVAL JOIN — the batch twin
    * of Structured Streaming's stream-stream join with watermarks
    * (IntervalJoinSpec runs the identical join condition over two
    * watermarked streams and converges to exactly this result): each
    * purchase pairs with the same user's clicks in the preceding
    * 6 hours. The batch plan is a user_id equi-join carrying the
    * time range as a residual; at corpus scale the banded
    * [[graft.operators.RangeJoin]] is the same semantics with a
    * bucketed equi-key. `micros_before` is an exact integer
    * difference — no float rounding concerns.
    */
  def intervalJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"),
        col("ts").as("c_ts"))
    p.join(c, Seq("user_id"))
      .where(col("c_ts") >= col("p_ts") - expr("interval 6 hours") &&
        col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("p_id"), col("c_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
          .as("micros_before"))
      .orderBy("p_id", "c_id")
  }

  /** Native `session_window` sessionization (30-minute gap) — the
    * SAME windowing Structured Streaming runs with a watermark
    * (SessionWindowSpec proves stream ≡ this), complementing
    * events_sessionize's lag+cumsum formulation: sessions merge while
    * the gap to the previous event is < 30 min, the window END is
    * last-event + gap (so start/end here are the session's
    * half-open validity range, not min/max event times).
    */
  def sessionWindowQuery(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")
}
