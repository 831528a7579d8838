package graft.streaming

import graft.operators.AggTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The daily rollup maintained LIVE — the aggregate-table analog of
  * [[LayoutMaintenance]] (15th streaming structure): each
  * micro-batch lands as one generation of distributive partials via
  * [[AggTable.insert]], generation id = micro-batch id + 1 (gen 0 is
  * the bootstrap [[AggTable.build]]), exactly-once from the insert's
  * own dynamic partition overwrite — a redelivered batch replaces
  * its generation rather than double-counting, no transaction log.
  * [[AggTable.serve]] answers between batches; the periodic batch
  * rebuild + [[AggTable.vacuumGens]] is the OPTIMIZE compaction.
  */
object AggMaintenance {

  /** Attach the maintenance loop to an events-shaped stream (needs
    * `ts`, `event_type`, `value`) over an existing base table.
    */
  def attach(events: DataFrame, path: String,
             checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        AggTable.insert(batch.sparkSession, path, batch, gen = id + 1)
      }
      .start()
}
