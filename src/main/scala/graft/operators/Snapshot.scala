package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot as a SINK — the reference's `Persistence::snapshot`
  * (persistence.cc takeSnapshot: serialize index + filter state,
  * record lastSnapshotID) re-expressed as a parquet checkpoint of the
  * per-key partial state.
  *
  * Recovery contract (proved by SnapshotSpec and the
  * vdb_snapshot_replay oracle): `resume(snapshot, tail)` ≡ replaying
  * the full log, because the state is algebraic (WalReplay.⊎). At
  * 100 TB the snapshot is a partitioned parquet dataset and resume is
  * a union + re-aggregate — no driver-side replay loop, and the tail
  * predicate (`event_id > lastSnapshotID`) pushes down to the log
  * scan.
  */
object Snapshot {

  /** Materialize per-key state (WalReplay.partialState shape). */
  def write(state: DataFrame, path: String): Unit =
    state.write.mode("overwrite").parquet(path)

  /** Take a snapshot of everything at or below `snapshotMaxId`. */
  def take(events: DataFrame, snapshotMaxId: Long, path: String): Unit =
    write(WalReplay.partialState(
      events.where(org.apache.spark.sql.functions.col("event_id")
        <= snapshotMaxId)), path)

  /** Reload: stored snapshot ⊎ WAL tail (rows strictly after the
    * snapshot id — disjointness is the mergeStates precondition).
    */
  def resume(s: SparkSession, path: String, events: DataFrame,
             snapshotMaxId: Long): DataFrame = {
    val tail = WalReplay.partialState(
      events.where(org.apache.spark.sql.functions.col("event_id")
        > snapshotMaxId))
    WalReplay.mergeStates(s.read.parquet(path), tail)
  }
}
