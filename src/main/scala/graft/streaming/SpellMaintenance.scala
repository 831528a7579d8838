package graft.streaming

import graft.operators.Search
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The spell dictionary maintained LIVE — the 13th streaming
  * structure, applying the [[PostingsMaintenance]] recipe to the
  * deletion-key index: a stream of new documents folds into the
  * persisted dictionary per micro-batch via the touched-buckets
  * insert, while correction queries keep probing it.
  *
  * Composition of pieces proven separately: the bootstrap is a batch
  * [[Search.spellIndexBuildFrom]] of the existing corpus (the
  * snapshot-then-tail split), each micro-batch is
  * [[Search.spellIndexInsert]] (insert-grown ≡ rebuilt, SearchSpec),
  * and a re-delivered batch replaces its own rows (the insert's
  * doc_id anti-join over doc-granular facts), so foreachBatch
  * retries are safe. No sidecars exist to repair: the rows ARE the
  * whole structure, which is what made the doc-granular layout worth
  * its storage.
  */
object SpellMaintenance {

  /** Attach the maintenance loop to a document stream
    * (doc_id, text) over an existing dictionary at `path`.
    */
  def attach(docs: DataFrame, path: String,
             checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Search.spellIndexInsert(batch.sparkSession, path, batch)
      }
      .start()
}
