package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One WAL record (the events table is the log). */
case class WalEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                    value: Double)

/** Per-key recovered state — same shape WalReplay produces in batch. */
case class WalState(user_id: Long, n_events: Long, sum_value: Double,
                    last_value: Double, last_ts: Long, last_event_id: Long)

/** Structured-Streaming twin of [[graft.operators.WalReplay]]: the
  * reference replays its WAL on startup in a driver loop
  * (reference vector_database.cc:21 reloadDatabase →
  * persistence.cc readNextWALLog); here the log is a STREAM and the
  * per-key state is maintained incrementally by
  * `mapGroupsWithState` — the same algebraic state the batch replay
  * aggregates, so snapshot ⊎ tail ≡ full-replay holds identically,
  * and recovery after failure is the engine's checkpoint replay
  * rather than bespoke WAL code.
  */
object WalStream {

  def updateState(userId: Long, events: Iterator[WalEvent],
                  state: GroupState[WalState]): WalState = {
    val zero = WalState(userId, 0L, 0.0, 0.0, Long.MinValue, Long.MinValue)
    val merged = events.foldLeft(state.getOption.getOrElse(zero)) { (st, e) =>
      val ts = e.ts.getTime
      val newer = ts > st.last_ts ||
        (ts == st.last_ts && e.event_id > st.last_event_id)
      WalState(userId, st.n_events + 1, st.sum_value + e.value,
        if (newer) e.value else st.last_value,
        math.max(st.last_ts, ts),
        if (newer) e.event_id else st.last_event_id)
    }
    state.update(merged)
    merged
  }

  /** Run the stateful recovery over a streaming Dataset of WAL
    * events; emits the updated per-key state each micro-batch.
    */
  def recover(s: SparkSession, events: Dataset[WalEvent]): Dataset[WalState] = {
    import s.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateState)
  }

  /** Batch reference result shaped like the streaming output, for
    * spec-level equivalence checks.
    */
  def batchReference(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      sum("value").as("sum_value"),
      max_by(col("value"), struct(col("ts"), col("event_id")))
        .as("last_value"))
}
