package graft.streaming

import graft.operators.Search
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The prefix dictionary maintained LIVE — the 21st streaming
  * structure, the [[SpellMaintenance]] recipe applied to the
  * pfx-partitioned term dictionary: a stream of new documents folds
  * into the persisted structure per micro-batch via the touched-pfx
  * insert, while wildcard queries keep probing it.
  *
  * Composition of pieces proven separately: bootstrap is a batch
  * [[Search.prefixDictBuild]] of the existing corpus (snapshot-then-
  * tail), each micro-batch is [[Search.prefixDictInsert]]
  * (insert-grown ≡ rebuilt AND redelivery-idempotent, SearchSpec),
  * so foreachBatch retries are safe; the doc-granular rows ARE the
  * whole structure — no sidecars to repair.
  */
object PrefixDictMaintenance {

  /** Attach the maintenance loop to a document stream
    * (doc_id, text) over an existing dictionary at `path`.
    */
  def attach(docs: DataFrame, path: String,
             checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Search.prefixDictInsert(batch.sparkSession, path, batch)
      }
      .start()
}
