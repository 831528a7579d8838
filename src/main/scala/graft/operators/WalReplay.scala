package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot + WAL-tail replay as distributed aggregation.
  *
  * The reference persists a snapshot and on restart replays only WAL
  * records with id > lastSnapshotID
  * (persistence.cc loadSnapshot/readNextWALLog,
  * vector_database.cc:21 reloadDatabase). The correctness property is
  * that state(snapshot) ⊎ state(tail) ≡ state(full log).
  *
  * Here the per-key state is (event count, value sum, last value by
  * (ts, event_id)) and ⊎ is an algebraic merge — partial states are
  * themselves rows, so recovery is a union + re-aggregate: fully
  * parallel, no driver-side replay loop, and the same plan works
  * whether the "snapshot" is a parquet checkpoint or a live stream
  * (see streaming.WalStream for the readStream twin).
  */
object WalReplay {

  /** Aggregate a log slice into per-key partial state. */
  def partialState(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      sum("value").as("sum_value"),
      max_by(col("value"), struct(col("ts"), col("event_id"))).as("last_value"),
      max(struct(col("ts"), col("event_id"))).as("_lk"))

  /** ⊎: merge any number of partial states (count/sum are sums, last
    * value wins by the max (ts, event_id) key).
    *
    * PRECONDITION: the input states must come from DISJOINT log
    * slices that together partition the log (as [[replayComposed]]
    * guarantees by splitting on event_id ≤/> snapshotMaxId — the
    * reference has the identical contract: the WAL tail starts
    * strictly after lastSnapshotID, persistence.cc readNextWALLog).
    * Overlapping slices would double-count n_events/sum_value and
    * make the max-by-_lk tie-break arbitrary.
    */
  def mergeStates(states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy("user_id").agg(
        sum("n_events").as("n_events"),
        sum("sum_value").as("sum_value"),
        max_by(col("last_value"), col("_lk")).as("last_value"),
        max(col("_lk")).as("_lk"))

  /** Recovery path: state from snapshot slice + WAL tail; equals a
    * full replay (the oracle checks exactly that equivalence).
    */
  def replayComposed(events: DataFrame, snapshotMaxId: Long): DataFrame = {
    val snap = partialState(events.where(col("event_id") <= snapshotMaxId))
    val tail = partialState(events.where(col("event_id") > snapshotMaxId))
    mergeStates(snap, tail)
      .select(
        col("user_id"),
        col("n_events"),
        round(col("sum_value"), 4).as("sum_value"),
        round(col("last_value"), 4).as("last_value"))
      .orderBy("user_id")
  }
}
