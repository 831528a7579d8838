package graft.streaming

import graft.operators.ZOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The z-order layout maintained LIVE — the 13h/13k discipline on the
  * skipping index: an event stream lands as one z-sorted GENERATION
  * per micro-batch ([[ZOrder.zorderAppend]]), published through the
  * stats sidecar, queryable by [[ZOrder.skipScan]] between batches.
  *
  * Exactly-once without a transaction log: the generation id IS the
  * micro-batch id (+1 — generation 0 is the bootstrap build), and
  * both the data and sidecar writes are dynamic partition overwrites
  * of `gen=<id>`, so a redelivered batch (crash replay, retry)
  * replaces its own generation instead of duplicating rows — the
  * same idempotence the versioned StateSink and the touched-bucket
  * postings insert get from owning their write scope. Pruning
  * degrades as generations accrete; a periodic batch
  * [[ZOrder.buildZorder]] rewrite is the OPTIMIZE compaction.
  */
object LayoutMaintenance {

  /** Attach the maintenance loop to an events-shaped stream (must
    * carry `ts` and `user_id`, plus whatever payload the layout
    * serves) over an EXISTING base layout.
    */
  def attach(events: DataFrame, path: String,
             checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ZOrder.zorderAppend(batch.sparkSession, path, batch, gen = id + 1)
      }
      .start()
}
